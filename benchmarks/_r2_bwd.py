import json, os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from flashattn_tpu.utils.platform import enable_compilation_cache
enable_compilation_cache()
from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained

B, H = 1, 24
N = int(os.environ.get("SW_N", "4096"))
D = int(os.environ.get("SW_D", "128"))
causal = os.environ.get("SW_CAUSAL", "0") == "1"
q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)

# numerics: grads vs oracle grads
loss = lambda f: lambda a, b, c: (f(a, b, c).astype(jnp.float32) ** 2).sum()
g = jax.grad(loss(lambda a, b, c: flash_attention(a, b, c, causal=causal)),
             (0, 1, 2))(q, k, v)
go = jax.grad(loss(lambda a, b, c: attention_reference(
    *(x.astype(jnp.float32) for x in (a, b, c)), causal=causal)),
    (0, 1, 2))(q, k, v)
mds = {f"d{n}": round(float(jnp.max(jnp.abs(
    a.astype(jnp.float32) - b.astype(jnp.float32)))), 5)
    for n, a, b in zip("qkv", g, go)}

def step(qq, kk, vv):
    dq, dk, dv = jax.grad(
        lambda x, y, z: flash_attention(x, y, z, causal=causal)
        .astype(jnp.float32).sum(), argnums=(0, 1, 2))(qq, kk, vv)
    return (qq + 1e-30 * dq
            + (1e-30 * (dk.astype(jnp.float32).sum()
                        + dv.astype(jnp.float32).sum())).astype(qq.dtype))

t = time_chained(step, q, consts=(k, v), iters=24, warmup_iters=6, repeats=2)
flops = attention_flops(B, H, N, N, D, causal=causal, mode="fwd_bwd")
print(json.dumps({"N": N, "D": D, "causal": causal,
                  "ms": round(t * 1e3, 3),
                  "tflops_7fpm": round(flops / t / 1e12, 1), **mds}))
