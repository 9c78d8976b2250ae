"""Backend detection and Pallas execution-mode policy.

Role parity: the reference gates its build/run path per platform
(rocwmma_fattn/FlashAttn.py:7-16 picks ZLUDA vs ROCm and pins the GPU arch).
Here the equivalent decision is "compile Pallas kernels with Mosaic (TPU) or
run them in interpreter mode (CPU/testing)" — tests force a CPU backend with a
virtual device mesh (SURVEY.md §4), so kernels must transparently interpret.
"""

from __future__ import annotations

import functools
import os

import jax


@functools.lru_cache(maxsize=None)
def backend() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    return backend() == "tpu"


def pallas_interpret_default() -> bool:
    """True when Pallas kernels should run in interpreter mode.

    Mosaic only targets TPU; on CPU (pytest) we interpret. Overridable via
    ``FLASHATTN_TPU_INTERPRET=0/1`` for debugging on-device.
    """
    env = os.environ.get("FLASHATTN_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return not on_tpu()


def num_devices() -> int:
    return jax.device_count()


@functools.lru_cache(maxsize=None)
def native_fp8_matmul() -> bool:
    """Whether the local accelerator multiplies fp8 natively.

    TPU v5e/v5p convert fp8 operands in software — measured 5-7× SLOWER than
    int8 in-kernel dequant on v5e (benchmarks/results/decode.jsonl) — so fp8
    KV quantization silently degrades there. v6e (Trillium) and later have
    native fp8 MXU paths.
    """
    if not on_tpu():
        return False
    kind = jax.devices()[0].device_kind.lower()
    return any(t in kind for t in ("v6", "v7"))


def enable_compilation_cache(
    cache_dir: str | None = None, *, min_compile_secs: float = 1.0
) -> str | None:
    """Enable JAX's persistent compilation cache (XLA binaries cached on
    disk across processes). Called by every bench/driver entry point: the
    remote-compile RPC on tunneled TPU backends costs tens of seconds per
    program, and benches re-run the same programs every round.

    Must run before the first compilation. Returns the cache dir, or None if
    the config is unavailable.
    """
    if cache_dir is None:
        cache_dir = os.environ.get(
            "FLASHATTN_TPU_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir


_warm_thread = None


def start_transfer_warmup() -> None:
    """Kick the first device→host transfer of this process in a background
    thread.

    On the tunneled remote-TPU backend the FIRST readback of a process can
    stall for minutes (measured 4 s to >600 s on the same code — a
    remote-side chip-claim/tunnel condition, not a property of the program;
    `block_until_ready` returns early on this backend so only a real
    readback forces the wait). Every later transfer in the process is fast.
    Starting a tiny throwaway fetch here lets the stall elapse CONCURRENTLY
    with compiles and on-device work; call :func:`join_transfer_warmup`
    before the first latency-sensitive readback (timing fetches, numerics
    gates)."""
    global _warm_thread
    if _warm_thread is not None:
        return
    import threading

    import jax.numpy as jnp

    x = jnp.zeros((8, 128), jnp.float32).sum()

    def _fetch():
        try:
            float(x)
        except Exception:
            pass

    _warm_thread = threading.Thread(target=_fetch, daemon=True)
    _warm_thread.start()


def join_transfer_warmup(timeout: float | None = None) -> None:
    """Wait for :func:`start_transfer_warmup`'s fetch (no-op if never
    started)."""
    if _warm_thread is not None:
        _warm_thread.join(timeout=timeout)


_io_callback_patched = False


def patch_io_callback_inline() -> None:
    """Make ``jax.io_callback`` read its operands in place on CPU backends.

    The Mosaic-TPU interpreter runs each virtual device's kernel inside an
    ``io_callback`` whose default impl round-trips every operand through
    ``device_put(args, cpu:0)``. Interpreted kernels BLOCK inside their
    callbacks (semaphore waits, RDMA handshakes), and on hosts with few
    cores all such transfers funnel into cpu:0's wedged execution queue —
    a guaranteed deadlock for any cross-device kernel (e.g. the RDMA ring
    in parallel/ring_kernel.py) interpreted on >2 virtual devices.

    On the CPU backend the FFI already hands the callback host buffers, so
    the round-trip is pure overhead; this patch replaces it with
    ``np.asarray`` views. Only used by multi-device interpret-mode tests;
    never active on real TPU runs (callbacks there are host-side only).
    """
    global _io_callback_patched
    if _io_callback_patched:
        return
    if backend() != "cpu":
        raise RuntimeError(
            "patch_io_callback_inline is a CPU-interpret-test workaround; "
            f"backend is {backend()!r}")

    import numpy as np
    from jax._src import callback as _cb
    from jax._src import tree_util as _tu

    def _impl_inline(*args, result_avals, callback, sharding, ordered):
        del result_avals, sharding, ordered
        args = tuple(np.asarray(a) for a in args)
        return _tu.tree_map(np.asarray, callback(*args))

    _cb.io_callback_impl = _impl_inline
    _io_callback_patched = True
