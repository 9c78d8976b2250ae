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

# Round-3 postmortem: an UNBOUNDED flock wait starved the driver's bench.py
# for 1684 s until it was killed (rc=124, no headline number recorded for the
# round). The lock must protect measurement honesty without being able to
# erase the round's official artifact — so waits are bounded by default.
DEFAULT_TIMEOUT = float(os.environ.get("FLASHATTN_TPU_LOCK_TIMEOUT", "600"))

_lock_fd = None  # held for process lifetime; os closes it at exit


def _holder_diagnostic() -> str:
    """Best-effort 'who holds the lock' string (pid + cmdline)."""
    try:
        with open(LOCK_PATH) as f:
            pid = int(f.read().split()[0])
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read().replace(b"\0", b" ").decode(errors="replace").strip()
        return f"pid {pid}: {cmd}"
    except Exception as e:  # holder exited, stale file, non-Linux...
        return f"unknown holder ({e.__class__.__name__})"


def acquire_tpu_lock(*, verbose: bool = True,
                     timeout: float | None = None,
                     on_timeout: str = "proceed") -> bool:
    """Acquire the exclusive TPU lock, waiting at most ``timeout`` seconds.

    Returns True if the lock was acquired. On timeout, prints the holder's
    pid/cmdline and either returns False (``on_timeout="proceed"`` — the
    caller runs unserialized, accepting possible timing noise; correct for
    the one bench whose artifact must exist) or raises SystemExit
    (``on_timeout="abort"`` — correct for optional spot sweeps, which should
    yield rather than contend).

    Set ``FLASHATTN_TPU_LOCK=off`` to disable (e.g. CPU-only CI).
    ``FLASHATTN_TPU_LOCK_TIMEOUT`` overrides the default 600 s bound;
    ``timeout=float("inf")`` restores the old unbounded behavior.
    """
    global _lock_fd
    if _lock_fd is not None or LOCK_PATH == "off":
        return True
    if timeout is None:
        timeout = DEFAULT_TIMEOUT
    fd = os.open(LOCK_PATH, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.monotonic()
    waited = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            pass
        elapsed = time.monotonic() - t0
        if not waited:
            waited = True
            if verbose:
                print(f"[tpu_lock] waiting for {LOCK_PATH} "
                      f"(held by {_holder_diagnostic()}; "
                      f"timeout {timeout:.0f}s)...",
                      file=sys.stderr, flush=True)
        if elapsed >= timeout:
            msg = (f"[tpu_lock] TIMEOUT after {elapsed:.1f}s — lock held by "
                   f"{_holder_diagnostic()}")
            if on_timeout == "abort":
                os.close(fd)
                raise SystemExit(msg + " (aborting; rerun when free)")
            print(msg + " (proceeding WITHOUT the lock; timings may be "
                  "contended — treat results as lower bounds)",
                  file=sys.stderr, flush=True)
            os.close(fd)
            return False
        time.sleep(min(2.0, max(0.05, timeout - elapsed)))
    if waited and verbose:
        print(f"[tpu_lock] acquired after {time.monotonic() - t0:.1f}s",
              file=sys.stderr, flush=True)
    os.ftruncate(fd, 0)
    os.write(fd, f"{os.getpid()}\n".encode())
    _lock_fd = fd
    return True
