"""Round-4 macro-tier tuning: windowed band fwd/fwd+bwd at long N.

Sweeps the macro slab knobs (fwd: FLASHATTN_TPU_MACRO_ROWS; bwd:
FLASHATTN_TPU_MACRO_BWD_COLS/SUB) in subprocesses, plus a resident-vs-macro
arm at N in the resident range (is the per-slab band fetch worth it below
the resident ceiling?). Median-of-5 on >=50 ms chains.

Results that set the r4 defaults (window=(2048,-1) causal D=128 bf16):
  fwd+bwd N=8192:  cols2048/sub512 105.8 TF  > cols1024 98.8  > sub1024 90-101
  fwd    N=8192:   131 TF; N=16384: 128; N=32768: 119 (was 63 flat)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
B, H, N, D = 1, 24, %(N)d, 128
causal, window, mode = %(causal)r, %(window)r, %(mode)r
q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)
fl = attention_flops(B, H, N, N, D, causal=causal, mode=mode, window=window)
if mode == "fwd":
    step = lambda qq, kk, vv: qq + 1e-30 * flash_attention(
        qq, kk, vv, causal=causal, window=window)
else:
    def step(qq, kk, vv):
        grads = jax.grad(
            lambda q, k, v: (flash_attention(q, k, v, causal=causal,
                                             window=window)
                             .astype(jnp.float32) ** 2).sum(),
            (0, 1, 2))(qq, kk, vv)
        return qq + 1e-30 * (grads[0] + 1e-30 * jnp.sum(grads[1])
                             + 1e-30 * jnp.sum(grads[2]))
st = time_chained_stats(step, q, consts=(k, v), iters=16, warmup_iters=4,
                        repeats=5)
import os
env = {k2: os.environ[k2] for k2 in os.environ
       if k2.startswith(("FLASHATTN_TPU_MACRO", "FLASHATTN_TPU_RC_MAXN",
                         "FLASHATTN_TPU_RB_MAXN"))}
print(f"RESULT mode={mode} N={N} window={window} {env}: "
      f"{st['per_iter']*1e3:.3f} ms {fl/st['per_iter']/1e12:.1f} TF "
      f"spread={st['spread']*100:.1f}%%", flush=True)
'''


def run(arms, N, causal, window, mode):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for label, cfg in arms:
        env = dict(os.environ)
        env.update(cfg)
        body = BODY % {"root": root, "N": N, "causal": causal,
                       "window": window, "mode": mode}
        try:
            r = subprocess.run([sys.executable, "-c", body], env=env,
                               capture_output=True, text=True, timeout=2400)
        except subprocess.TimeoutExpired:
            print(f"{label}: TIMEOUT", flush=True)
            continue
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
        print(f"{label}: {out[0]}" if out
              else f"{label}: FAILED rc={r.returncode} {r.stderr[-250:]}",
              flush=True)


if __name__ == "__main__":
    W = (2048, -1)
    print("=== macro fwd slab rows, window=2048 N=16384 ===", flush=True)
    run([("m1024-default", {}),
         ("m512", {"FLASHATTN_TPU_MACRO_ROWS": "512"})],
        16384, True, W, "fwd")
    print("=== macro bwd slab, window=2048 N=8192 ===", flush=True)
    run([("c2048s512-default", {}),
         ("c1024s512", {"FLASHATTN_TPU_MACRO_BWD_COLS": "1024"}),
         ("c2048s1024", {"FLASHATTN_TPU_MACRO_BWD_SUB": "1024"})],
        8192, True, W, "fwd_bwd")
    print("=== resident vs macro below the ceiling, window=2048 N=4096 ===",
          flush=True)
    run([("resident-default", {}),
         ("forced-macro", {"FLASHATTN_TPU_RC_MAXN": "2048",
                           "FLASHATTN_TPU_RB_MAXN": "2048"})],
        4096, True, W, "fwd")
    run([("resident-default", {}),
         ("forced-macro", {"FLASHATTN_TPU_RC_MAXN": "2048",
                           "FLASHATTN_TPU_RB_MAXN": "2048"})],
        4096, True, W, "fwd_bwd")
    print("ALL DONE", flush=True)
