"""On-chip spot check for the in-kernel RDMA ring (parallel/ring_kernel.py).

One chip cannot exercise cross-device RDMA, but the degenerate 1-device ring
is the only place the kernel's Mosaic lowering is ever compiled for real
hardware (HBM↔VMEM async copies over a 6-D ANY buffer, semaphore arrays,
persistent VMEM running state) — interpret-mode tests cannot catch lowering
bugs (NOTES.md). Validates numerics vs the oracle and times the route
against the single-device fused kernel for reference.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from flashattn_tpu.utils.platform import enable_compilation_cache

from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

acquire_tpu_lock(on_timeout="abort")  # serialize; yield if the chip is busy
enable_compilation_cache()

from jax.sharding import Mesh

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.parallel.ring_kernel import ring_attention_kernel_sharded
from flashattn_tpu.utils.testing import FWD_TOL, make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained


def main():
    # Kept small: the kernel body unrolls B·Hkv·nqt merge tiles × nk/block_k
    # KV steps per ring step, and the remote Mosaic compile of the 4096/H8
    # variant exceeded 15 min on the tunnel. H4/N2048 (16 tiles × 4 steps)
    # exercises every lowering feature at ~1/8 the program size.
    B, H, N, D = 1, 4, 2048, 128
    dtype = jnp.bfloat16
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)
    mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("seq",))
    for causal in (False, True):
        fn = ring_attention_kernel_sharded(
            mesh, axis="seq", batch_axis=None, head_axis=None, causal=causal)
        o = fn(q, k, v)
        w = attention_reference(
            *(x.astype(jnp.float32) for x in (q, k, v)), causal=causal)
        md = float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))
        ok = md < FWD_TOL[jnp.dtype(dtype)].atol
        t = time_chained(lambda qq, k, v: fn(qq, k, v), q, consts=(k, v),
                         iters=16, warmup_iters=4, repeats=3)
        t_ref = time_chained(
            lambda qq, k, v: flash_attention(qq, k, v, causal=causal),
            q, consts=(k, v), iters=16, warmup_iters=4, repeats=3)
        fl = attention_flops(B, H, N, N, D, causal=causal, mode="fwd")
        print(json.dumps({
            "check": f"ring_kernel_1chip_causal={causal}",
            "N": N, "D": D, "maxdiff": round(md, 6), "ok": ok,
            "ms": round(t * 1e3, 4), "tflops": round(fl / t / 1e12, 2),
            "fused_kernel_ms": round(t_ref * 1e3, 4),
        }), flush=True)
        if not ok:
            sys.exit(f"NUMERICS FAILED: ring kernel causal={causal}")


if __name__ == "__main__":
    main()
