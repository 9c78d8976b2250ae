"""Component timing for the unaligned decomposition at N=4097 D=64."""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flashattn_tpu.utils.platform import enable_compilation_cache, start_transfer_warmup, join_transfer_warmup
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock
acquire_tpu_lock(on_timeout="abort")
enable_compilation_cache(); start_transfer_warmup()
import jax, jax.numpy as jnp
from flashattn_tpu import flash_attention
from flashattn_tpu.ops import flash
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import time_chained_stats
join_transfer_warmup()

B, H, N, D = 1, 24, 4097, 64
q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)
qm = km = 4096
qa, ka, va = q[:, :, :qm], k[:, :, :km], v[:, :, :km]

def t(name, fn, carry, consts, flops):
    s = time_chained_stats(fn, carry, consts=consts, iters=32, warmup_iters=8, repeats=3)
    per = s["per_iter"]
    print(json.dumps({"name": name, "ms": round(per*1e3, 4),
                      "tflops": round(flops/per/1e12, 2),
                      "spread_pct": round(s["spread"]*100, 1)}), flush=True)
    return per

fl_main = 2*2*B*H*qm*km*D
# (a) aligned main, no lse
t("aligned4096", lambda qq,kk,vv: flash_attention(qq,kk,vv), qa, (ka,va), fl_main)
# (b) aligned main with lse
from flashattn_tpu import flash_attention_with_lse
t("aligned4096_lse", lambda qq,kk,vv: flash_attention_with_lse(qq,kk,vv)[0], qa, (ka,va), fl_main)
# (c) full decomposed 4097
fl_full = 2*2*B*H*N*N*D
t("decomposed4097", lambda qq,kk,vv: flash_attention(qq,kk,vv), q, (k,v), fl_full)
# (d) decomposed but carry aligned slice to avoid carry-shape mismatch: main+kvtail merge only
def main_kvtail(qq, kk, vv):
    o, _ = flash._fwd_unaligned_decomposed(
        qq, kk[:, :, :km+1], vv[:, :, :km+1], scale=D**-0.5,
        offsets=jnp.zeros((2,), jnp.int32), interpret=False,
        return_lse=False, softcap=None)
    return o[:, :, :qm]
t("main_plus_kvtail_merge", main_kvtail, qa, (k, v), fl_main)
