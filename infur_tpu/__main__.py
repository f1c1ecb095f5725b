from infur_tpu.cli import main

raise SystemExit(main())
