"""Checkpoint/resume (utils/checkpoint.py): save → restore roundtrip for a
train state (params + optimizer + step), orbax path with npz fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu.models.transformer import (
    TransformerConfig, adamw_init, init_transformer,
)
from flashattn_tpu.utils import checkpoint as ckpt

CFG = TransformerConfig(
    vocab_size=64, d_model=32, n_layers=1, n_heads=2, n_kv_heads=1,
    d_head=16, d_ff=64, dtype=jnp.float32,
)


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    params = init_transformer(jax.random.PRNGKey(0), CFG)
    state = {"params": params, "opt": adamw_init(params),
             "step": jnp.asarray(7, jnp.int32)}
    p = ckpt.save(str(tmp_path / "state"), state)
    got = ckpt.restore(p if p.endswith(".npz") else str(tmp_path / "state"),
                       like=state)
    _assert_trees_equal(state, got)


def test_latest_step_dir(tmp_path):
    assert ckpt.latest_step_dir(str(tmp_path / "none")) is None
    for s in (1, 20, 3):
        (tmp_path / str(s)).mkdir()
    assert ckpt.latest_step_dir(str(tmp_path)).endswith("/20")
