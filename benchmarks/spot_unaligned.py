"""Spot-check the unaligned-N decomposition (r5): equal-work TFLOP/s at the
r4-weak shapes vs the committed attn_fwd_unaligned_bf16.jsonl rows."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flashattn_tpu.utils.platform import enable_compilation_cache, start_transfer_warmup, join_transfer_warmup
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock
acquire_tpu_lock(on_timeout="abort")
enable_compilation_cache(); start_transfer_warmup()
import bench_attention as ba
join_transfer_warmup()
import json
shapes = json.loads(os.environ.get("SPOT_SHAPES", "[[4097,64],[7169,64]]"))
for (N, D) in shapes:
    ba.bench_one("ours", 1, 24, N, D, causal=False, mode="fwd")
