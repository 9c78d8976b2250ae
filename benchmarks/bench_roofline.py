"""Measure this chip's MXU roofline and print one JSON line per arm.

Role parity: GPU_peak_perf_test.py:41-61 — the reference measures its
roofline at runtime, every run, so %-of-peak claims are anchored to the
session that produced them. Two arms:

  * ``pallas_probe`` — register/VMEM-resident chained MXU dots
    (ops/roofline.py, the WMMA-loop equivalent),
  * ``xla_matmul``  — big chained XLA matmul (what a perfectly-scheduled
    large GEMM achieves through the whole XLA stack).

The roofline quoted against kernels is the max of the arms. Appends to
benchmarks/results/roofline.jsonl when --append is passed.

Run: python benchmarks/bench_roofline.py [--append]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flashattn_tpu.utils.platform import enable_compilation_cache
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

acquire_tpu_lock(on_timeout="abort")  # serialize; yield if the chip is busy
enable_compilation_cache()

import jax

from flashattn_tpu.ops.roofline import (
    measure_mxu_peak_tflops,
    measure_xla_matmul_peak_tflops,
)


def main():
    rows = []
    stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
    kind = jax.devices()[0].device_kind
    for arm, fn in (("pallas_probe", measure_mxu_peak_tflops),
                    ("xla_matmul", measure_xla_matmul_peak_tflops)):
        tf = fn()
        rows.append({"arm": arm, "tflops": round(tf, 2), "dtype": "bfloat16",
                     "device": kind, "time": stamp})
        print(json.dumps(rows[-1]), flush=True)
    peak = max(r["tflops"] for r in rows)
    rows.append({"arm": "roofline", "tflops": peak, "dtype": "bfloat16",
                 "device": kind, "time": stamp})
    print(json.dumps(rows[-1]), flush=True)
    if "--append" in sys.argv:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results", "roofline.jsonl")
        with open(out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
