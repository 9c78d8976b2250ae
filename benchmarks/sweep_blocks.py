"""Block-size sweep for the fwd kernel vs the JAX reference Pallas kernel."""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    flash_attention as jax_fa,
)

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.flash import BlockSizes
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained


def main():
    causal = "--causal" in sys.argv
    for D in (64, 128):
        q, k, v = make_qkv(jax.random.PRNGKey(0), 1, 24, 4096, D,
                           dtype=jnp.bfloat16)
        flops = attention_flops(1, 24, 4096, 4096, D, causal=causal, mode="fwd")

        t = time_chained(
            lambda qq: jax_fa(qq, k, v, causal=causal), q, iters=32, repeats=2)
        print(f"D={D} jax-pallas-fa: {t*1e3:.3f} ms {flops/t/1e12:.1f} TF/s",
              flush=True)
        for bq, bk in ((256, 512), (128, 128), (256, 256), (512, 512),
                       (512, 1024), (1024, 1024)):
            bs = BlockSizes(bq, bk, 128, 128, 128, 128)
            t = time_chained(
                lambda qq: flash_attention(qq, k, v, causal=causal,
                                           block_sizes=bs),
                q, iters=32, repeats=2)
            print(f"D={D} ours({bq},{bk}): {t*1e3:.3f} ms "
                  f"{flops/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
