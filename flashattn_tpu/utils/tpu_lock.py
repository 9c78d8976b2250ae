"""Cross-process TPU serialization lock.

There is ONE TPU chip behind the tunnel; two benchmark processes sharing it
time-slice and corrupt each other's measurements (round-2 postmortem: the
driver's bench.py overlapped a sweep refresh and recorded a physically
impossible 216 TFLOP/s row). Every benchmark/spot entry point calls
:func:`acquire_tpu_lock` before its first device work; the flock is held for
the life of the process, so concurrent launches serialize instead of
interleaving.

Role parity note: the reference has no such guard (single interactive GPU);
this is infrastructure the tunneled single-chip setup requires for honest
numbers (SURVEY.md §5 metrics discipline).
"""

from __future__ import annotations

import fcntl
import os
import sys
import time

LOCK_PATH = os.environ.get("FLASHATTN_TPU_LOCK", "/tmp/flashattn_tpu.lock")

_lock_fd = None  # held for process lifetime; os closes it at exit


def acquire_tpu_lock(*, verbose: bool = True) -> None:
    """Block until this process holds the exclusive TPU lock (idempotent).

    Set ``FLASHATTN_TPU_LOCK=off`` to disable (e.g. CPU-only CI where no
    device contention exists).
    """
    global _lock_fd
    if _lock_fd is not None or LOCK_PATH == "off":
        return
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.monotonic()
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        if verbose:
            print(f"[tpu_lock] waiting for {LOCK_PATH} "
                  f"(another TPU process is running)...",
                  file=sys.stderr, flush=True)
        fcntl.flock(fd, fcntl.LOCK_EX)
        if verbose:
            print(f"[tpu_lock] acquired after "
                  f"{time.monotonic() - t0:.1f}s", file=sys.stderr, flush=True)
    os.write(fd, f"{os.getpid()}\n".encode())
    _lock_fd = fd
