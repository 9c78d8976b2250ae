"""Native C++ planner ≡ Python fallback; bench-stats sanity.

The reference keeps its host planning in native code (kernel_fp16.cu:744-876);
ours must stay available both natively and as a pure-Python fallback, with
identical outputs.
"""

import math

import numpy as np
import pytest

from flashattn_tpu.ops.flash import _python_block_policy
from flashattn_tpu.utils import native


requires_native = pytest.mark.skipif(
    native._load() is None, reason="native planner unavailable (no g++?)"
)


@requires_native
@pytest.mark.parametrize(
    "shape",
    [(1537, 1234, 111, 2), (128, 128, 64, 2), (8192, 8192, 128, 4),
     (1, 333, 64, 2), (4096, 4096, 512, 2)],
)
def test_native_plan_matches_python(shape):
    nq, nk, d, itemsize = shape
    got = native.plan(nq, nk, d, itemsize)
    bp = _python_block_policy(nq, nk, d, itemsize)
    want = (bp.block_q, bp.block_k, bp.block_q_dkv, bp.block_k_dkv,
            bp.block_q_dq, bp.block_k_dq)
    assert got == want


@requires_native
def test_native_full_plan_consistency():
    p = native.full_plan(1000, 2000, 64, 2)
    assert p["nq_padded"] % p["block_q"] == 0
    assert p["nk_padded"] % p["block_k"] == 0
    assert p["d_padded"] % 64 == 0  # head-dim pads to 64-multiples
    assert p["grid_q_tiles"] == p["nq_padded"] // p["block_q"]
    assert p["vmem_bytes_fwd"] > 0 and p["flops_fwd"] > 0


@requires_native
def test_native_bench_stats():
    samples = [3.0, 1.0, 2.0, 4.0, 5.0]
    s = native.bench_stats(samples)
    assert math.isclose(s["mean"], 3.0)
    assert math.isclose(s["min"], 1.0)
    assert math.isclose(s["std"], np.std(samples))
    assert s["p50"] == 3.0


@requires_native
def test_native_plan_rejects_bad_input():
    assert native.plan(0, 128, 64, 2) is None
