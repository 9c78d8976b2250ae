"""Round-2 scratch: on-chip numerics + perf for the fwd kernel rework."""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from flashattn_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained


def check(tag, B, H, N, D, *, causal=False, window=None, nk=None,
          dtype=jnp.bfloat16, bench=True):
    nk = nk or N
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, Nk=nk, dtype=dtype)
    o = flash_attention(q, k, v, causal=causal, window=window)
    w = attention_reference(*(x.astype(jnp.float32) for x in (q, k, v)),
                            causal=causal, window=window)
    md = float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))
    rec = {"tag": tag, "maxdiff": round(md, 6)}
    if bench:
        t = time_chained(
            lambda qq, k, v: flash_attention(qq, k, v, causal=causal,
                                             window=window),
            q, consts=(k, v), iters=32, warmup_iters=8, repeats=2)
        flops = attention_flops(B, H, N, nk, D, causal=causal, mode="fwd")
        rec["ms"] = round(t * 1e3, 3)
        rec["tflops"] = round(flops / t / 1e12, 1)
    print(json.dumps(rec), flush=True)
    assert md < (2e-2 if dtype == jnp.bfloat16 else 2e-5), (tag, md)


check("causal_D128", 1, 24, 4096, 128, causal=True)
check("noncausal_D128", 1, 24, 4096, 128)
check("noncausal_D64", 1, 24, 4096, 64)
check("causal_D64", 1, 24, 4096, 64, causal=True)
check("noncausal_D160", 1, 24, 4096, 160)
check("window2048_D128", 1, 24, 4096, 128, window=(2047, 0))
check("unaligned", 3, 7, 1537, 111, nk=1234, causal=True, bench=False)
check("f32_D64", 1, 8, 2048, 64, dtype=jnp.float32, bench=False)
print("ALL OK")
