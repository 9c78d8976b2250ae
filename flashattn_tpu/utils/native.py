"""ctypes loader for the native host planner (csrc/planner.cpp).

Role parity: the reference's host-side launch logic — tile policy, padding
arithmetic, grid/LDS sizing, dtype dispatch — is native C++
(kernel_fp16.cu:744-876 host launchers, host.cpp dispatch), JIT-built on first
import (FlashAttn.py:23-41). Here the native component is a small C++ planner
(block-size policy, padding plan, VMEM/cost estimates, bench statistics)
compiled on first use with the system toolchain and loaded via ctypes; a
Python fallback (ops/flash.py:_python_block_policy) keeps the package working
where no compiler exists. test_native.py pins C++ and Python plans equal.
"""

from __future__ import annotations

import ctypes
import functools
import os
import pathlib
import subprocess

_CSRC = pathlib.Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_NAME = "libfa_planner.so"


class _Plan(ctypes.Structure):
    _fields_ = [
        ("block_q", ctypes.c_int),
        ("block_k", ctypes.c_int),
        ("block_q_dkv", ctypes.c_int),
        ("block_k_dkv", ctypes.c_int),
        ("block_q_dq", ctypes.c_int),
        ("block_k_dq", ctypes.c_int),
        ("nq_padded", ctypes.c_int),
        ("nk_padded", ctypes.c_int),
        ("d_padded", ctypes.c_int),
        ("grid_q_tiles", ctypes.c_int),
        ("grid_kv_tiles", ctypes.c_int),
        ("vmem_bytes_fwd", ctypes.c_longlong),
        ("flops_fwd", ctypes.c_longlong),
        ("bytes_hbm_fwd", ctypes.c_longlong),
    ]


@functools.lru_cache(maxsize=1)
def _load():
    """Build (if needed) and load the planner; None if unavailable."""
    if os.environ.get("FLASHATTN_TPU_NO_NATIVE"):
        return None
    lib_path = _CSRC / _LIB_NAME
    src = _CSRC / "planner.cpp"
    if not src.exists():
        return None
    try:
        if not lib_path.exists() or lib_path.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 str(src), "-o", str(lib_path)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(lib_path))
    except (OSError, subprocess.SubprocessError):
        return None
    lib.fa_plan.restype = ctypes.c_int
    lib.fa_plan.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(_Plan),
    ]
    lib.fa_bench_stats.restype = ctypes.c_int
    lib.fa_bench_stats.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    return lib


def plan(nq: int, nk: int, d: int, itemsize: int, has_bias: bool = False,
         causal: bool = False):
    """Native tile plan → 6-tuple of block sizes, or None (fallback to Python)."""
    lib = _load()
    if lib is None:
        return None
    out = _Plan()
    rc = lib.fa_plan(nq, nk, d, itemsize, int(causal), int(has_bias),
                     ctypes.byref(out))
    if rc != 0:
        return None
    return (out.block_q, out.block_k, out.block_q_dkv, out.block_k_dkv,
            out.block_q_dq, out.block_k_dq)


def full_plan(nq: int, nk: int, d: int, itemsize: int, causal: bool = False,
              has_bias: bool = False):
    """Full native plan struct as a dict (padding, grid, VMEM/cost estimates)."""
    lib = _load()
    if lib is None:
        return None
    out = _Plan()
    rc = lib.fa_plan(nq, nk, d, itemsize, int(causal), int(has_bias),
                     ctypes.byref(out))
    if rc != 0:
        return None
    return {f[0]: getattr(out, f[0]) for f in _Plan._fields_}


def bench_stats(samples):
    """Native summary statistics (mean/std/min/p50/p90) for bench timings."""
    lib = _load()
    if lib is None:
        return None
    n = len(samples)
    arr = (ctypes.c_double * n)(*samples)
    out = (ctypes.c_double * 5)()
    rc = lib.fa_bench_stats(arr, n, out)
    if rc != 0:
        return None
    return {"mean": out[0], "std": out[1], "min": out[2],
            "p50": out[3], "p90": out[4]}
