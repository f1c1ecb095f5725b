#!/bin/bash
# Run a TPU tool with a relay preflight: probe with short-lived processes
# until the relay answers (wedges last minutes-to-hours, BENCH_NOTES.md),
# then exec the command.  Usage: tools/tpu_run.sh <budget_s> <cmd...>
set -u
BUDGET=${1:?budget seconds}; shift
DEADLINE=$(( $(date +%s) + BUDGET ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 90 python -c "import jax,numpy;print(numpy.asarray(jax.numpy.ones(4)).sum())" 2>/dev/null | grep -q 4.0; then
    exec "$@"
  fi
  echo "tpu_run: relay not answering, retrying..." >&2
  sleep 20
done
echo "tpu_run: relay never recovered within ${BUDGET}s" >&2
exit 1
