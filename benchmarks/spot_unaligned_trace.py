"""Trace the decomposed unaligned forward to find the 0.6 ms of composite
overhead (r5): per-op device timings from jax.profiler."""
import sys, os, glob, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flashattn_tpu.utils.platform import enable_compilation_cache, start_transfer_warmup, join_transfer_warmup
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock
acquire_tpu_lock(on_timeout="abort")
enable_compilation_cache(); start_transfer_warmup()
import jax, jax.numpy as jnp
from flashattn_tpu import flash_attention
from flashattn_tpu.utils.testing import make_qkv
join_transfer_warmup()

q, k, v = make_qkv(jax.random.PRNGKey(0), 1, 24, 4097, 64, dtype=jnp.bfloat16)
f = jax.jit(lambda q,k,v: flash_attention(q,k,v))
f(q,k,v).block_until_ready()
out = "/tmp/unaligned_trace"
with jax.profiler.trace(out):
    for _ in range(8):
        f(q,k,v).block_until_ready()
print("trace done ->", out)
