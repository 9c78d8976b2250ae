"""Targeted vendor-arm rerun: the two causal long-N points (N=12288/16384
D=64) that the sweep ran at default blocks because no tuned entry existed.
Seeded to block 1024 (the winner at every N>=1024)."""
import os

os.environ.setdefault("FLASHATTN_TPU_TUNE_JAXFA", "0")

import bench_attention as ba  # noqa: E402

for N in (12288, 16384):
    ba.bench_one("jaxfa", 1, 24, N, 64, causal=True, mode="fwd")
