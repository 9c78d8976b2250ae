"""Model families: transformer LM (train/decode/sharded) and SD-style U-Net.

The reference's model story is "drop the kernel into SD's U-Net and measure
it/s" (README.md:104-154); here the models are part of the framework and are
tested end-to-end on CPU (kernels in interpret mode, sharding on the virtual
8-device mesh).
"""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu.models.diffusion import euler_sample
from flashattn_tpu.models.transformer import (
    TransformerConfig,
    adamw_init,
    decode_step,
    init_kv_cache,
    init_transformer,
    lm_loss,
    make_sharded_train_step,
    transformer_forward,
)
from flashattn_tpu.models.unet import UNetConfig, init_unet, unet_forward
from flashattn_tpu.parallel import make_mesh

CFG = TransformerConfig(
    vocab_size=128, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
    d_head=32, d_ff=128, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def lm_params():
    return init_transformer(jax.random.PRNGKey(0), CFG)


def test_transformer_forward_and_loss(lm_params):
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 128)
    logits = transformer_forward(lm_params, toks, CFG)
    assert logits.shape == (2, 64, 128)
    assert bool(jnp.all(jnp.isfinite(logits)))
    loss = lm_loss(lm_params, toks, CFG)
    assert 3.0 < float(loss) < 7.0  # ~ln(128) at init


def test_lm_attn_impl_equivalence(lm_params):
    """The fused engine and exact-XLA attention must agree through the LM
    (the bench_lm arms compute the same function; mirrors the U-Net's
    test_unet_attn_impl_equivalence)."""
    toks = jax.random.randint(jax.random.PRNGKey(9), (1, 64), 0, 128)
    lf = float(lm_loss(lm_params, toks, CFG))
    lx = float(lm_loss(lm_params, toks, CFG, attn_impl="xla"))
    assert abs(lf - lx) < 5e-3, (lf, lx)


@pytest.mark.slow
def test_lm_softcap_equivalence():
    """Gemma-2-class config: logit_softcap wired through the fused engine
    must agree with the exact-XLA arm, in forward and decode."""
    import dataclasses as _dc

    cfg = _dc.replace(CFG, logit_softcap=20.0)
    params = init_transformer(jax.random.PRNGKey(3), cfg)
    toks = jax.random.randint(jax.random.PRNGKey(41), (1, 64), 0, 128)
    lf = float(lm_loss(params, toks, cfg))
    lx = float(lm_loss(params, toks, cfg, attn_impl="xla"))
    assert abs(lf - lx) < 5e-3, (lf, lx)
    # the cap must matter
    l0 = float(lm_loss(params, toks, CFG))
    assert abs(lf - l0) > 1e-5

    # decode path honors the cap: one decode step equals the forward column
    cache = init_kv_cache(cfg, 1, 32)
    logits_f = transformer_forward(params, toks[:, :1], cfg)
    logits_d, cache = decode_step(params, cache, toks[:, 0], cfg)
    assert float(jnp.max(jnp.abs(logits_d - logits_f[:, 0]))) < 2e-3

    qcache = init_kv_cache(cfg, 1, 32, quant_dtype=jnp.int8)
    with pytest.raises(ValueError, match="softcap"):
        decode_step(params, qcache, toks[:, 0], cfg)


@pytest.mark.slow
def test_packed_batch_matches_separate(lm_params):
    """Packed-batch golden test: two documents packed into one row (with
    segment_ids) produce exactly the per-document logits and a loss equal to
    the token-weighted mean of the separate losses (segment attention
    blocking + per-document RoPE restart + boundary-masked loss)."""
    n1, n2 = 28, 36
    toks = jax.random.randint(jax.random.PRNGKey(21), (1, n1 + n2), 0, 128)
    seg = jnp.concatenate(
        [jnp.zeros((1, n1), jnp.int32), jnp.ones((1, n2), jnp.int32)], axis=1)
    packed = transformer_forward(lm_params, toks, CFG, segment_ids=seg)
    sep1 = transformer_forward(lm_params, toks[:, :n1], CFG)
    sep2 = transformer_forward(lm_params, toks[:, n1:], CFG)
    want = jnp.concatenate([sep1, sep2], axis=1)
    assert float(jnp.max(jnp.abs(packed - want))) < 2e-4

    lp = float(lm_loss(lm_params, toks, CFG, segment_ids=seg))
    l1 = float(lm_loss(lm_params, toks[:, :n1], CFG))
    l2 = float(lm_loss(lm_params, toks[:, n1:], CFG))
    want_loss = ((n1 - 1) * l1 + (n2 - 1) * l2) / (n1 + n2 - 2)
    assert abs(lp - want_loss) < 1e-5, (lp, want_loss)


@pytest.mark.slow
def test_packed_batch_grads_flow(lm_params):
    toks = jax.random.randint(jax.random.PRNGKey(22), (2, 48), 0, 128)
    seg = jnp.cumsum(
        jax.random.bernoulli(jax.random.PRNGKey(23), 0.1, (2, 48))
        .astype(jnp.int32), axis=1)
    g = jax.grad(lambda p: lm_loss(p, toks, CFG, segment_ids=seg))(lm_params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


@pytest.mark.slow
def test_decode_matches_forward(lm_params):
    """KV-cache decode must reproduce teacher-forced logits exactly."""
    toks = jax.random.randint(jax.random.PRNGKey(2), (2, 32), 0, 128)
    logits = transformer_forward(lm_params, toks, CFG)
    cache = init_kv_cache(CFG, 2, 32)
    step = jax.jit(lambda c, t: decode_step(lm_params, c, t, CFG))
    errs = []
    for t in range(6):
        lg, cache = step(cache, toks[:, t])
        errs.append(float(jnp.max(jnp.abs(lg - logits[:, t]))))
    tol = 1e-2 if jax.default_backend() == "tpu" else 1e-4
    assert max(errs) < tol, errs


def test_decode_quantized_cache(lm_params):
    """int8 KV-cache decode must track full-precision decode closely (the
    in-kernel-dequant serving path, ops/quant.py)."""
    toks = jax.random.randint(jax.random.PRNGKey(9), (2, 16), 0, 128)
    cache = init_kv_cache(CFG, 2, 16)
    qcache = init_kv_cache(CFG, 2, 16, quant_dtype=jnp.int8)
    step = jax.jit(lambda c, t: decode_step(lm_params, c, t, CFG))
    errs = []
    for t in range(5):
        lg, cache = step(cache, toks[:, t])
        qlg, qcache = step(qcache, toks[:, t])
        errs.append(float(jnp.max(jnp.abs(lg - qlg))))
    scale = float(jnp.max(jnp.abs(lg)))
    assert max(errs) < 0.05 * max(scale, 1.0), (errs, scale)


@pytest.mark.slow
def test_sharded_train_step_runs_and_learns(lm_params):
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(data=2, model=2, seq=2)
    step, _, _ = make_sharded_train_step(mesh, CFG, lr=1e-3)
    opt = adamw_init(lm_params)
    toks = jax.random.randint(jax.random.PRNGKey(3), (4, 256), 0, 128)
    params, opt, loss0 = step(lm_params, opt, toks)
    for _ in range(3):
        params, opt, loss = step(params, opt, toks)
    assert float(loss) < float(loss0)  # memorizing one batch


@pytest.mark.slow
def test_sharded_matches_single_device(lm_params):
    """tp-only sharding must reproduce single-device loss (no seq-shard
    boundary effects at sp=1)."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(data=2, model=2, seq=1)
    step, _, _ = make_sharded_train_step(mesh, CFG, lr=0.0)
    opt = adamw_init(lm_params)
    toks = jax.random.randint(jax.random.PRNGKey(4), (4, 65), 0, 128)
    _, _, loss = step(lm_params, opt, toks)
    want = lm_loss(lm_params, toks, CFG)
    assert abs(float(loss) - float(want)) < 2e-3


@pytest.mark.slow
def test_sharded_seq_loss_matches_single_device(lm_params):
    """sp>1 loss equals the single-device loss: shard-boundary targets come
    from a one-token halo exchange (ppermute), with the global final
    position masked (VERDICT r1 weak #5)."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(data=1, model=1, seq=4)
    step, _, _ = make_sharded_train_step(mesh, CFG, lr=0.0)
    opt = adamw_init(lm_params)
    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 64), 0, 128)
    _, _, loss = step(lm_params, opt, toks)
    want = lm_loss(lm_params, toks, CFG)
    assert abs(float(loss) - float(want)) < 2e-3, (float(loss), float(want))


@pytest.mark.slow
def test_packed_sharded_loss_matches_single_device(lm_params):
    """Packed batches under dp×sp: the sharded step's loss (ring attention
    with rotating segment ids, global positions, halo'd boundary mask) must
    equal the single-device packed lm_loss — including a document straddling
    the seq-shard boundary."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(data=2, seq=4)
    step, pspecs, opt_specs = make_sharded_train_step(
        mesh, CFG, with_segment_ids=True)
    params = init_transformer(jax.random.PRNGKey(0), CFG)
    opt = adamw_init(params)
    toks = jax.random.randint(jax.random.PRNGKey(31), (2, 64), 0, 128)
    # boundaries at 25 and 49: both documents straddle shard edges (16/32/48)
    seg = (jnp.arange(64)[None] >= 25).astype(jnp.int32) + (
        jnp.arange(64)[None] >= 49).astype(jnp.int32)
    seg = jnp.broadcast_to(seg, (2, 64))
    _, _, loss_sharded = step(params, opt, toks, seg)
    want = jnp.mean(jnp.stack([
        lm_loss(params, toks[i:i + 1], CFG, segment_ids=seg[i:i + 1])
        for i in range(2)]))
    assert abs(float(loss_sharded) - float(want)) < 1e-5


@pytest.mark.slow
def test_packed_all_boundary_loss_finite(lm_params):
    """Degenerate packing — every document is length 1, so every position is
    a boundary and zero positions carry loss. The sharded step must return a
    finite loss (0/max(0,1) = 0) and finite params, not NaN."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(data=2, seq=2)
    step, _, _ = make_sharded_train_step(mesh, CFG, with_segment_ids=True)
    opt = adamw_init(lm_params)
    toks = jax.random.randint(jax.random.PRNGKey(41), (2, 64), 0, 128)
    seg = jnp.broadcast_to(jnp.arange(64)[None], (2, 64)).astype(jnp.int32)
    params, _, loss = step(lm_params, opt, toks, seg)
    assert float(loss) == 0.0
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(params))


def test_packed_zigzag_rejected():
    mesh = make_mesh(seq=4)
    with pytest.raises(ValueError, match="contiguous"):
        make_sharded_train_step(mesh, CFG, seq_layout="zigzag",
                                with_segment_ids=True)


@pytest.mark.slow
def test_zigzag_seq_loss_matches_single_device(lm_params):
    """seq_layout='zigzag' (causally load-balanced SP) must reproduce the
    single-device loss exactly: RoPE positions, attention, and the two-halo
    next-token targets all follow the permuted layout."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(data=1, model=1, seq=4)
    step, _, _ = make_sharded_train_step(mesh, CFG, lr=0.0,
                                         seq_layout="zigzag")
    opt = adamw_init(lm_params)
    toks = jax.random.randint(jax.random.PRNGKey(5), (2, 64), 0, 128)
    _, _, loss = step(lm_params, opt, toks)
    want = lm_loss(lm_params, toks, CFG)
    assert abs(float(loss) - float(want)) < 2e-3, (float(loss), float(want))


@pytest.mark.slow
def test_zigzag_train_step_learns(lm_params):
    """zigzag layout trains end-to-end (params update, loss decreases)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(data=2, model=2, seq=2)
    step, _, _ = make_sharded_train_step(mesh, CFG, lr=1e-3,
                                         seq_layout="zigzag")
    opt = adamw_init(lm_params)
    toks = jax.random.randint(jax.random.PRNGKey(3), (4, 256), 0, 128)
    params, opt, loss0 = step(lm_params, opt, toks)
    for _ in range(3):
        params, opt, loss = step(params, opt, toks)
    assert float(loss) < float(loss0)


@pytest.mark.slow
def test_multislice_train_step_matches_single_device(lm_params):
    """2-level (slice x chip) mesh: slice axis outermost (DCN role), used
    only for batch DP / gradient psum — loss must equal single-device
    (SURVEY.md §2.5 multi-slice comm row)."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(data=1, model=1, seq=2, slices=2)
    assert mesh.axis_names == ("slice", "data", "model", "seq")
    step, _, _ = make_sharded_train_step(mesh, CFG, lr=0.0)
    opt = adamw_init(lm_params)
    toks = jax.random.randint(jax.random.PRNGKey(6), (2, 64), 0, 128)
    _, _, loss = step(lm_params, opt, toks)
    want = lm_loss(lm_params, toks, CFG)
    assert abs(float(loss) - float(want)) < 2e-3, (float(loss), float(want))


UCFG = UNetConfig.tiny()


@pytest.fixture(scope="module")
def unet_params():
    return init_unet(jax.random.PRNGKey(0), UCFG)


@pytest.mark.slow
def test_unet_forward(unet_params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.array([10.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32))
    eps = unet_forward(unet_params, x, t, ctx, UCFG)
    assert eps.shape == (2, 16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(eps)))


@pytest.mark.slow
def test_unet_grads_flow(unet_params):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
    t = jnp.array([100.0])
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 32))
    g = jax.grad(
        lambda p: (unet_forward(p, x, t, ctx, UCFG) ** 2).sum()
    )(unet_params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # the transformer's output projection must receive gradient (attention
    # backward wired through; earlier attn weights are zero at init because
    # proj_out is zero-initialized, as in SD)
    gp = g["mid"]["attn"]["proj_out"]["w"]
    assert float(jnp.max(jnp.abs(gp))) > 0


@pytest.mark.slow
def test_euler_sampler(unet_params):
    ctx = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 32))
    x = euler_sample(unet_params, jax.random.PRNGKey(6), ctx, cfg=UCFG,
                     shape=(1, 16, 16, 4), steps=3)
    assert x.shape == (1, 16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(x)))


@pytest.mark.slow
def test_unet_attn_impl_equivalence(unet_params):
    """The fused engine and exact-XLA attention must agree through the whole
    U-Net (the SD bench's two arms compute the same function)."""
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 16, 4))
    t = jnp.array([250.0])
    ctx = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 32))
    o_fused = unet_forward(unet_params, x, t, ctx, UCFG)
    o_xla = unet_forward(unet_params, x, t, ctx, UCFG, attn_impl="xla")
    assert float(jnp.max(jnp.abs(o_fused - o_xla))) < 5e-2


@pytest.mark.slow
def test_sdxl_shape_class():
    """SDXL config: per-level transformer depth, head_dim-derived heads,
    attention only at levels 1-2 (BASELINE.md SDXL rows)."""
    import dataclasses

    cfg = dataclasses.replace(
        UNetConfig.sdxl(), model_channels=64, context_dim=64,
        transformer_depth=(1, 1, 2), groups=8, zero_init=False,
        dtype=jnp.float32,
    )
    assert cfg.heads_for(128) == 2 and cfg.heads_for(256) == 4
    assert cfg.depth_at(2) == 2
    params = init_unet(jax.random.PRNGKey(0), cfg)
    # level 0 has no attention; level 1 does
    assert "attn" not in params["downs"][0]["blocks"][0]
    assert "attn" in params["downs"][1]["blocks"][0]
    assert len(params["mid"]["attn"]["blocks"]) == 2
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    eps = unet_forward(params, x, jnp.array([100.0]),
                       jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64)),
                       cfg)
    assert eps.shape == (1, 16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(eps)))


def test_remat_same_loss_and_grads():
    """cfg.remat=True must be numerically identical to the stored-activation
    path (jax.checkpoint recomputes, never approximates)."""
    import dataclasses

    from flashattn_tpu.models.transformer import (
        TransformerConfig, init_transformer, lm_loss)

    cfg = TransformerConfig(vocab_size=128, d_model=64, n_layers=2,
                            n_heads=4, n_kv_heads=2, d_head=16, d_ff=128,
                            dtype=jnp.float32)
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 65), 0, 128)
    cfg_r = dataclasses.replace(cfg, remat=True)
    l0, g0 = jax.value_and_grad(lambda p: lm_loss(p, tokens, cfg))(params)
    l1, g1 = jax.value_and_grad(lambda p: lm_loss(p, tokens, cfg_r))(params)
    assert abs(float(l0) - float(l1)) < 1e-6
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-5
