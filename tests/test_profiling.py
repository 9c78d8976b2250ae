"""Profiling utilities (SURVEY.md §5 tracing parity: RGP capture → jax
profiler traces; -save-temps → compiler-IR dumps)."""

import os

import jax
import jax.numpy as jnp

from flashattn_tpu.utils import profiling


def test_dump_kernel_ir(tmp_path):
    def f(x):
        return jnp.tanh(x) @ x.T

    x = jnp.ones((8, 8), jnp.float32)
    paths = profiling.dump_kernel_ir(f, x, out_dir=str(tmp_path), name="t")
    assert os.path.exists(paths["stablehlo"])
    text = open(paths["stablehlo"]).read()
    assert "stablehlo" in text or "mhlo" in text or "func" in text
    if paths["hlo"]:
        assert os.path.getsize(paths["hlo"]) > 0


def test_annotate_context():
    with profiling.annotate("region"):
        y = jnp.sum(jnp.arange(16.0))
    assert float(y) == 120.0


def test_trace_writes_dir(tmp_path):
    out = str(tmp_path / "tr")
    try:
        with profiling.trace(out):
            jnp.ones((4, 4)).sum().block_until_ready()
    except Exception:
        import pytest

        pytest.skip("profiler backend unavailable on this platform")
    assert os.path.isdir(out)
    assert any(os.scandir(out))
