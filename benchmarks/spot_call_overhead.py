"""Probe fixed per-pallas-call cost + merge cost on this chip."""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flashattn_tpu.utils.platform import enable_compilation_cache, start_transfer_warmup, join_transfer_warmup
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock
acquire_tpu_lock(on_timeout="abort")
enable_compilation_cache(); start_transfer_warmup()
import jax, jax.numpy as jnp
from flashattn_tpu import flash_attention
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import time_chained_stats
join_transfer_warmup()

def t(name, fn, carry, consts):
    s = time_chained_stats(fn, carry, consts=consts, iters=64, warmup_iters=8, repeats=3)
    print(json.dumps({"name": name, "ms": round(s["per_iter"]*1e3, 4),
                      "spread_pct": round(s["spread"]*100, 1)}), flush=True)

# tiny pallas attention call: 24 heads, 2048 rows x 128 cols (the kv-tail shape)
q2, k2, v2 = make_qkv(jax.random.PRNGKey(0), 1, 24, 4096, 64, dtype=jnp.bfloat16)
kt, vt = k2[:, :, :128], v2[:, :, :128]
t("kvtail_shape_call(4096x128)", lambda qq,kk,vv: flash_attention(qq,kk,vv), q2, (kt, vt))
# even tinier: 128 rows x 4224 cols (row-tail shape)
qt = q2[:, :, :128]
t("rowtail_shape_call(128x4096)", lambda qq,kk,vv: flash_attention(qq,kk,vv), qt, (k2, v2))
# pure merge cost: weighted sum of two [1,24,4096,64] bf16 + exp of lse
lse_a = jnp.zeros((1,24,4096), jnp.float32); lse_b = lse_a - 3.0
o2 = q2
def merge(oa, ob, la, lb):
    l = jnp.logaddexp(la, lb)
    wa = jnp.exp(la - l)[..., None]; wb = jnp.exp(lb - l)[..., None]
    return (oa.astype(jnp.float32)*wa + ob.astype(jnp.float32)*wb).astype(oa.dtype)
t("merge_only", lambda oa, ob, la, lb: merge(oa, ob, la, lb), q2, (o2, lse_a, lse_b))
# chained pair of tiny calls (dispatch pipelining test)
t("two_tiny_calls", lambda qq,kk,vv: flash_attention(flash_attention(qq,kk,vv),kk,vv), q2, (kt, vt))
