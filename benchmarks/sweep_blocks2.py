"""Second sweep: larger blocks, causal, SD head-dims, shorter sequences."""
import jax
import jax.numpy as jnp

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.flash import BlockSizes
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained


def run(tag, B, H, N, D, causal, bq, bk):
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)
    flops = attention_flops(B, H, N, N, D, causal=causal, mode="fwd")
    bs = BlockSizes(bq, bk, 128, 128, 128, 128)
    t = time_chained(
        lambda qq: flash_attention(qq, k, v, causal=causal, block_sizes=bs),
        q, iters=32, repeats=2)
    print(f"{tag} B{B} H{H} N{N} D{D} causal={int(causal)} "
          f"({bq},{bk}): {t*1e3:.3f} ms {flops/t/1e12:.1f} TF/s", flush=True)


# larger blocks at the headline shape
for bq, bk in ((1024, 2048), (2048, 1024), (2048, 2048), (1024, 4096)):
    run("big", 1, 24, 4096, 128, False, bq, bk)
# causal at the best-known blocks
for bq, bk in ((1024, 1024), (2048, 1024), (512, 512)):
    run("causal", 1, 24, 4096, 128, True, bq, bk)
    run("causal", 1, 24, 4096, 64, True, bq, bk)
# shorter sequences
for N in (1024, 2048):
    for bq, bk in ((min(N, 1024), min(N, 1024)), (512, 512)):
        run("shortN", 1, 24, N, 128, False, bq, bk)
# SD head dims (SD1.5 D=40/80/160 at 4096 tokens)
for D in (40, 80, 160):
    run("sd", 2, 8, 4096, D, False, 1024, 1024)
