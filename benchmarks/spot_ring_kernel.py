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
    # H8/N4096 since r4: the kernel's (batch, head, q-tile) and KV-tile
    # loops are ROLLED into fori_loops, so the Mosaic program size no longer
    # scales with the shape (the r3 fully-unrolled variant exceeded 15 min
    # of remote compile at this shape; rolled, it compiles in seconds).
    B, H, N, D = 1, 8, 4096, 128
    dtype = jnp.bfloat16
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)
    mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("seq",))
    for causal, window in ((False, None), (True, None), (True, (1024, -1))):
        fn = ring_attention_kernel_sharded(
            mesh, axis="seq", batch_axis=None, head_axis=None, causal=causal,
            window=window)
        o = fn(q, k, v)
        w = attention_reference(
            *(x.astype(jnp.float32) for x in (q, k, v)), causal=causal,
            window=window)
        md = float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))
        ok = md < FWD_TOL[jnp.dtype(dtype)].atol
        t = time_chained(lambda qq, k, v: fn(qq, k, v), q, consts=(k, v),
                         iters=16, warmup_iters=4, repeats=3)
        t_ref = time_chained(
            lambda qq, k, v: flash_attention(qq, k, v, causal=causal,
                                             window=window),
            q, consts=(k, v), iters=16, warmup_iters=4, repeats=3)
        fl = attention_flops(B, H, N, N, D, causal=causal, mode="fwd",
                             window=window)
        print(json.dumps({
            "check": f"ring_kernel_1chip_causal={causal}_window={window}",
            "N": N, "D": D, "H": H, "maxdiff": round(md, 6), "ok": ok,
            "ms": round(t * 1e3, 4), "tflops": round(fl / t / 1e12, 2),
            "fused_kernel_ms": round(t_ref * 1e3, 4),
        }), flush=True)
        if not ok:
            sys.exit(f"NUMERICS FAILED: ring kernel causal={causal} "
                     f"window={window}")


if __name__ == "__main__":
    main()
