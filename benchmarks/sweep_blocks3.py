"""Third sweep: remaining fwd configs (minus the VMEM-OOM one) + bwd blocks."""
import functools

import jax
import jax.numpy as jnp

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.flash import BlockSizes
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained


def run_fwd(tag, B, H, N, D, causal, bq, bk):
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)
    flops = attention_flops(B, H, N, N, D, causal=causal, mode="fwd")
    bs = BlockSizes(bq, bk, 128, 128, 128, 128)
    try:
        t = time_chained(
            lambda qq: flash_attention(qq, k, v, causal=causal, block_sizes=bs),
            q, iters=32, repeats=2)
        print(f"{tag} B{B}H{H}N{N}D{D}c{int(causal)} ({bq},{bk}): "
              f"{t*1e3:.3f} ms {flops/t/1e12:.1f} TF/s", flush=True)
    except Exception as e:
        print(f"{tag} ({bq},{bk}): FAIL {type(e).__name__}", flush=True)


def run_bwd(B, H, N, D, causal, bqdkv, bkdkv, bqdq, bkdq):
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)
    flops = attention_flops(B, H, N, N, D, causal=causal, mode="fwd_bwd")
    bs = BlockSizes(1024, 1024, bqdkv, bkdkv, bqdq, bkdq)

    def step(qq):
        g = jax.grad(
            lambda x: flash_attention(x, k, v, causal=causal,
                                      block_sizes=bs).astype(jnp.float32).sum()
        )(qq)
        return qq + 0.0 * g  # keep carry shape; depend on grad

    try:
        t = time_chained(step, q, iters=16, warmup_iters=4, repeats=2)
        print(f"bwd B{B}H{H}N{N}D{D}c{int(causal)} dkv({bqdkv},{bkdkv}) "
              f"dq({bqdq},{bkdq}): {t*1e3:.3f} ms {flops/t/1e12:.1f} TF/s",
              flush=True)
    except Exception as e:
        print(f"bwd dkv({bqdkv},{bkdkv}) dq({bqdq},{bkdq}): FAIL "
              f"{type(e).__name__}", flush=True)


for bq, bk in ((1024, 1024), (2048, 1024), (512, 512)):
    run_fwd("causal", 1, 24, 4096, 128, True, bq, bk)
    run_fwd("causal", 1, 24, 4096, 64, True, bq, bk)
for N in (1024, 2048, 8192):
    run_fwd("N", 1, 24, N, 128, False, min(N, 1024), min(N, 1024))
for D in (40, 80, 160, 256):
    run_fwd("sd", 2, 8, 4096, D, False, 1024, 1024)

for blocks in ((128, 128, 128, 128), (256, 256, 256, 256),
               (512, 512, 512, 512), (256, 512, 512, 256),
               (1024, 512, 512, 1024)):
    run_bwd(1, 24, 4096, 128, False, *blocks)
run_bwd(1, 24, 4096, 128, True, 512, 512, 512, 512)
run_bwd(1, 24, 4096, 64, False, 512, 512, 512, 512)
