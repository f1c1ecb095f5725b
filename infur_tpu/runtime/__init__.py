"""Host runtime: scheduler loop, metrics, config persistence, checkpoints.

The layer between the pipeline composite (:mod:`infur_tpu.app`) and a
frontend (CLI/viewer): a dedicated processing thread with adaptive command
intake and a bounded result channel for end-to-end backpressure — the
reference's proc-loop design (reference infur/src/main.rs:27-99) kept
because it is the right shape for interactive streaming.
"""

from infur_tpu.runtime.loop import ProcHandle, proc_loop, start_proc  # noqa: F401
from infur_tpu.runtime.metrics import FrameCounter  # noqa: F401
from infur_tpu.runtime.config import ProcConfig  # noqa: F401
