"""Round-4 tuning matrices: causal fwd+bwd at D=64 (the reference's own
headline training head size, bench_with_sdpa.py:52) and the D=160 tier
(VERDICT r3 weak #3/#5: 66.9 / 63.5 TFLOP/s — the two shape classes the r3
matrices never swept). Each arm runs in a subprocess so env knobs bind
before import; median-of-5 on >=50 ms chains via time_chained_stats.

Usage: python benchmarks/spot_d64_tune.py [d64|d160|all]
"""

import os
import subprocess
import sys

BODY = r'''
import sys; sys.path.insert(0, %(root)r)
import jax, jax.numpy as jnp
from flashattn_tpu.utils.platform import enable_compilation_cache
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock
acquire_tpu_lock(timeout=1800, on_timeout="abort")
enable_compilation_cache()
from flashattn_tpu import flash_attention
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained_stats
B, H, N, D, causal, mode = 1, 24, %(N)d, %(D)d, %(causal)r, %(mode)r
q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)
fl = attention_flops(B, H, N, N, D, causal=causal, mode=mode)
if mode == "fwd":
    step = lambda qq, kk, vv: qq + 1e-30 * flash_attention(
        qq, kk, vv, causal=causal)
else:
    def step(qq, kk, vv):
        grads = jax.grad(
            lambda q, k, v: (flash_attention(q, k, v, causal=causal)
                             .astype(jnp.float32) ** 2).sum(),
            (0, 1, 2))(qq, kk, vv)
        return qq + 1e-30 * (grads[0] + 1e-30 * jnp.sum(grads[1])
                             + 1e-30 * jnp.sum(grads[2]))
st = time_chained_stats(step, q, consts=(k, v), iters=16, warmup_iters=4,
                        repeats=5)
tf = fl / st["per_iter"] / 1e12
import os
env = {k2: os.environ[k2] for k2 in os.environ
       if k2.startswith("FLASHATTN_TPU_") and k2 not in
       ("FLASHATTN_TPU_LOCK", "FLASHATTN_TPU_CACHE_DIR")}
print(f"RESULT mode={mode} D={D} N={N} {env}: "
      f"{st['per_iter']*1e3:.3f} ms {tf:.1f} TF "
      f"spread={st['spread']*100:.1f}%%", flush=True)
'''

D64_FWDBWD = [
    ("baseline", {}),
    ("bf1024", {"FLASHATTN_TPU_BQF": "1024", "FLASHATTN_TPU_BKF": "1024"}),
    ("bf4096", {"FLASHATTN_TPU_BQF": "4096", "FLASHATTN_TPU_BKF": "4096"}),
    ("tri128", {"FLASHATTN_TPU_TRIF": "128"}),
    ("tri512", {"FLASHATTN_TPU_TRIF": "512"}),
    ("kvs2", {"FLASHATTN_TPU_BWD_KVS": "2"}),
    ("trila3", {"FLASHATTN_TPU_TRI_LA": "3"}),
    # fwd side (resident route at N=4096): chain geometry
    ("rcq512", {"FLASHATTN_TPU_RC_SUBQ": "512"}),
    ("rcq128", {"FLASHATTN_TPU_RC_SUBQ": "128"}),
    ("rck4096", {"FLASHATTN_TPU_RC_SUBK": "4096"}),
    ("rcq512k4096", {"FLASHATTN_TPU_RC_SUBQ": "512",
                     "FLASHATTN_TPU_RC_SUBK": "4096"}),
]

D160_FWDBWD = [
    ("baseline", {}),
    ("bf1024", {"FLASHATTN_TPU_BQF": "1024", "FLASHATTN_TPU_BKF": "1024"}),
    ("tri128", {"FLASHATTN_TPU_TRIF": "128"}),
    ("tri512", {"FLASHATTN_TPU_TRIF": "512"}),
    ("kvs2", {"FLASHATTN_TPU_BWD_KVS": "2"}),
    ("rcq512", {"FLASHATTN_TPU_RC_SUBQ": "512"}),
    ("rck1024", {"FLASHATTN_TPU_RC_SUBK": "1024"}),
]


def run(arms, N, D, causal, mode):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for label, cfg in arms:
        env = dict(os.environ)
        env.update(cfg)
        body = BODY % {"root": root, "N": N, "D": D, "causal": causal,
                       "mode": mode}
        try:
            r = subprocess.run([sys.executable, "-c", body], env=env,
                               capture_output=True, text=True, timeout=2400)
        except subprocess.TimeoutExpired:
            print(f"{label}: TIMEOUT", flush=True)
            continue
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
        if out:
            print(f"{label}: {out[0]}", flush=True)
        else:
            print(f"{label}: FAILED rc={r.returncode} {r.stderr[-250:]}",
                  flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("d64", "all"):
        print("=== D=64 causal fwd+bwd N=4096 ===", flush=True)
        run(D64_FWDBWD, 4096, 64, True, "fwd_bwd")
    if which in ("d160", "all"):
        print("=== D=160 causal fwd+bwd N=4096 ===", flush=True)
        run(D160_FWDBWD, 4096, 160, True, "fwd_bwd")
    print("ALL DONE", flush=True)
