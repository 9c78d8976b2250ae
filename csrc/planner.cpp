// Native host-side planner for flashattn_tpu.
//
// Role parity with the reference's native host layer: tile-size policy
// (FlashAttn.py:56-67 keeps it in Python, but the padding/grid/LDS arithmetic
// it feeds lives in C++, kernel_fp16.cu:744-876 and host.cpp), plus the
// benchmark statistics role of the per-bench count_time decorator
// (bench_with_sdpa.py:14-49). Built as a shared library, loaded via ctypes
// (flashattn_tpu/utils/native.py); the Python fallback in ops/flash.py must
// stay bit-identical — test_native.py enforces it.

#include <algorithm>
#include <cmath>
#include <cstdint>

namespace {

constexpr int kLanes = 128;            // TPU lane count / min tile dim
constexpr int64_t kVmemBudget = 96 << 20;  // conservative per-core VMEM budget

int round_up(int x, int m) { return ((x + m - 1) / m) * m; }

int fit(int n, int pref) {
  return std::max(kLanes, std::min(pref, round_up(n, kLanes)));
}

}  // namespace

extern "C" {

struct FaPlan {
  int block_q, block_k;
  int block_q_dkv, block_k_dkv;
  int block_q_dq, block_k_dq;
  int nq_padded, nk_padded, d_padded;
  int grid_q_tiles, grid_kv_tiles;
  long long vmem_bytes_fwd;
  long long flops_fwd;
  long long bytes_hbm_fwd;
};

// Tile/padding/cost plan for one attention call. Mirrors
// flashattn_tpu.ops.flash._python_block_policy exactly (pinned by test).
int fa_plan(int nq, int nk, int d, int itemsize, int causal, int has_bias,
            FaPlan* out) {
  if (nq <= 0 || nk <= 0 || d <= 0 || itemsize <= 0 || out == nullptr)
    return 1;

  // Tuned on TPU v5e (benchmarks/sweep_blocks*.py): fwd (1024,1024); bwd
  // dkv(1024,512) + dq(512,1024); shrink for D>256 (scoped-VMEM ~16 MB) and
  // when a bias adds an f32 (block_q, block_k) tile to the working set.
  // Must mirror ops/flash.py::_python_block_policy exactly (test_native.py).
  const bool big_d = d > 256;
  const bool small = big_d || has_bias;
  // Thin-matmul shapes (D <= 64, noncausal, no bias): wider tiles amortize
  // the per-grid-step pipeline floor (86.6 -> 92.2 TFLOP/s at N=4096 D=64,
  // spot_tune d64 matrix, r3). — mirrors ops/flash.py::_python_block_policy
  const bool thin = d <= 64 && !causal && !has_bias && nq > 32;
  int bq_pref = thin ? 2048 : (small ? 512 : 1024);
  while (bq_pref >= 2048 && round_up(nq, bq_pref / 2) < round_up(nq, bq_pref))
    bq_pref /= 2;
  out->block_q = fit(nq, bq_pref);
  // Decode shapes (nq <= 32): 16-row Q tile — sublane-aligned, skips the
  // ~8x wasted MXU/VPU work of padding Nq to 128. Mirrors the Python policy.
  if (nq <= 32) out->block_q = std::max(16, round_up(nq, 16));
  // 2048-wide blocks run as 2x1024 sub-tiles in-kernel (MXU/VPU overlap).
  // Causal prefers square 1024 tiles: the flat-grid diagonal block is then
  // exactly half-masked with no fully-dead sub-tile. Off-multiple Nk drops
  // to narrower blocks when that shrinks the padded tail.
  // — mirrors ops/flash.py::_python_block_policy
  int bk_pref = big_d ? 512 : (causal ? 1024 : (thin ? 4096 : 2048));
  while (bk_pref >= 2048 && round_up(nk, bk_pref / 2) < round_up(nk, bk_pref))
    bk_pref /= 2;
  out->block_k = fit(nk, bk_pref);
  int bq_dkv_pref = big_d ? 256 : (has_bias ? 512 : 2048);
  if (bq_dkv_pref == 2048 && round_up(nq, 1024) < round_up(nq, 2048))
    bq_dkv_pref = 1024;
  out->block_q_dkv = fit(nq, bq_dkv_pref);
  out->block_k_dkv = fit(nk, big_d ? 256 : (has_bias ? 512 : 1024));
  out->block_q_dq = fit(nq, big_d ? 256 : (has_bias ? 512 : 1024));
  int bk_dq_pref = big_d ? 256 : (has_bias ? 512 : 2048);
  if (bk_dq_pref == 2048 && round_up(nk, 1024) < round_up(nk, 2048))
    bk_dq_pref = 1024;
  out->block_k_dq = fit(nk, bk_dq_pref);

  out->nq_padded = round_up(nq, out->block_q);
  out->nk_padded = round_up(nk, out->block_k);
  // head-dim lane padding: 64-multiples (Mosaic-native; +11% at D=64 on
  // v5e vs 128-rounding) — mirrors ops/flash.py::_pad_head_dim
  out->d_padded = round_up(d, 64);
  out->grid_q_tiles = out->nq_padded / out->block_q;
  out->grid_kv_tiles = out->nk_padded / out->block_k;

  // VMEM: Q + K + V tiles (input dtype), scores tile (f32), m/l/acc scratch
  // (f32) — the brbcCalc.xlsx role (SURVEY.md §2.2).
  const int64_t dp = out->d_padded;
  const int64_t bq = out->block_q, bk = out->block_k;
  out->vmem_bytes_fwd = bq * dp * itemsize        // Q
                        + 2 * bk * dp * itemsize  // K, V
                        + bq * bk * 4             // scores
                        + 2 * bq * kLanes * 4     // m, l
                        + bq * dp * 4;            // acc
  if (out->vmem_bytes_fwd > kVmemBudget) return 2;

  // FLOPs model matching the reference benches: fwd = 2 * 2*N*Nkv*D per
  // (batch, head), halved for causal (bench_with_sdpa.py:35-41, 129-133).
  double f = 4.0 * static_cast<double>(out->nq_padded) * out->nk_padded * dp;
  if (causal) f *= 0.5;
  out->flops_fwd = static_cast<long long>(f);
  out->bytes_hbm_fwd =
      static_cast<long long>(itemsize) *
      (static_cast<int64_t>(nq) * d * 2 + static_cast<int64_t>(nk) * d * 2);
  return 0;
}

// Summary stats for bench timings: mean/std/min/p50/p90 over samples.
// (count_time keeps mean only, bench_with_sdpa.py:30-47; we add dispersion.)
int fa_bench_stats(double* samples, int n, double* out5) {
  if (samples == nullptr || out5 == nullptr || n <= 0) return 1;
  double sum = 0.0, sq = 0.0, mn = samples[0];
  for (int i = 0; i < n; ++i) {
    sum += samples[i];
    sq += samples[i] * samples[i];
    mn = std::min(mn, samples[i]);
  }
  const double mean = sum / n;
  const double var = std::max(0.0, sq / n - mean * mean);
  // percentiles on a sorted copy (nearest-rank)
  double* tmp = new double[n];
  std::copy(samples, samples + n, tmp);
  std::sort(tmp, tmp + n);
  const double p50 = tmp[std::min(n - 1, (n * 50) / 100)];
  const double p90 = tmp[std::min(n - 1, (n * 90) / 100)];
  delete[] tmp;
  out5[0] = mean;
  out5[1] = std::sqrt(var);
  out5[2] = mn;
  out5[3] = p50;
  out5[4] = p90;
  return 0;
}

}  // extern "C"
