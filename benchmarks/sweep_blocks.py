"""Block-size tuning sweep — one parameterized tool (the gemm_test/
scratchpad role, SURVEY.md §2.3; consolidates the three round-1 one-off
sweep scripts).

  python benchmarks/sweep_blocks.py                       # fwd, D=64/128
  python benchmarks/sweep_blocks.py --causal --D 128
  python benchmarks/sweep_blocks.py --mode fwd_bwd --blocks "1024,1024;512,2048"
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattn_tpu.utils.platform import enable_compilation_cache

from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

acquire_tpu_lock(on_timeout="abort")  # serialize; yield if the chip is busy
enable_compilation_cache()

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.flash import BlockSizes
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained

DEFAULT_BLOCKS = [(512, 512), (512, 1024), (1024, 1024), (1024, 2048),
                  (512, 2048), (2048, 1024)]


def run_point(B, H, N, D, *, causal, mode, bq, bk, iters):
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)
    bs = BlockSizes(block_q=bq, block_k=bk,
                    block_q_dkv=bq, block_k_dkv=bk,
                    block_q_dq=bq, block_k_dq=bk)
    if mode == "fwd":
        step = lambda qq, kk, vv: flash_attention(
            qq, kk, vv, causal=causal, block_sizes=bs)
    else:
        def step(qq, kk, vv):
            dq, dk, dv = jax.grad(
                lambda a, b, c: flash_attention(
                    a, b, c, causal=causal, block_sizes=bs)
                .astype(jnp.float32).sum(), argnums=(0, 1, 2))(qq, kk, vv)
            return (qq + 1e-30 * dq
                    + (1e-30 * (dk.astype(jnp.float32).sum()
                                + dv.astype(jnp.float32).sum())
                       ).astype(qq.dtype))
    try:
        t = time_chained(step, q, consts=(k, v), iters=iters,
                         warmup_iters=max(2, iters // 4), repeats=2)
    except Exception as e:  # noqa: BLE001 — OOM/lowering: record, continue
        print(json.dumps({"B": B, "H": H, "N": N, "D": D, "causal": causal,
                          "mode": mode, "bq": bq, "bk": bk,
                          "error": type(e).__name__}), flush=True)
        return
    flops = attention_flops(B, H, N, N, D, causal=causal, mode=mode)
    print(json.dumps({"B": B, "H": H, "N": N, "D": D, "causal": causal,
                      "mode": mode, "bq": bq, "bk": bk,
                      "ms": round(t * 1e3, 3),
                      "tflops": round(flops / t / 1e12, 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=1)
    ap.add_argument("--H", type=int, default=24)
    ap.add_argument("--N", default="4096")
    ap.add_argument("--D", default="64,128")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--mode", default="fwd", choices=["fwd", "fwd_bwd"])
    ap.add_argument("--blocks", default=None,
                    help='semicolon-separated "bq,bk" pairs')
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    blocks = (DEFAULT_BLOCKS if args.blocks is None else
              [tuple(int(x) for x in b.split(","))
               for b in args.blocks.split(";")])
    ns = [int(x) for x in str(args.N).split(",")]
    ds = [int(x) for x in str(args.D).split(",")]
    for N, D, (bq, bk) in itertools.product(ns, ds, blocks):
        run_point(args.B, args.H, N, D, causal=args.causal, mode=args.mode,
                  bq=bq, bk=bk, iters=args.iters)


if __name__ == "__main__":
    main()
