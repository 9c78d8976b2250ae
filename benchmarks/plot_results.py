"""Render benchmark jsonl results to PNG curves — parity with the
reference's published TFLOPS/VRAM graphs (bench_with_sdpa.py:168-305,
README.md:72-102). The jsonl files stay the canonical artifact; this just
draws them.

  python benchmarks/plot_results.py [--results benchmarks/results] [--out benchmarks/results/plots]
"""

from __future__ import annotations

import argparse
import collections
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return [r for r in recs if "error" not in r]


def plot_file(path, out_dir):
    recs = load(path)
    if not recs:
        return None
    name = os.path.splitext(os.path.basename(path))[0]
    made = []
    for xkey, fixed in (("N", "D"), ("D", "N")):
        by_impl = collections.defaultdict(dict)
        fixed_vals = {r.get(fixed) for r in recs if xkey in r}
        if len([r for r in recs if xkey in r]) < 2:
            continue
        # pick the most common fixed value (e.g. D=64 for the N sweep)
        counts = collections.Counter(r.get(fixed) for r in recs)
        fv = counts.most_common(1)[0][0]
        for r in recs:
            if r.get(fixed) == fv and "tflops" in r:
                by_impl[r.get("impl", "ours")][r[xkey]] = r
        if not any(len(v) > 1 for v in by_impl.values()):
            continue
        for ykey, unit in (("tflops", "TFLOP/s"), ("peak_mem_mb", "MiB")):
            if not any(r.get(ykey) for d in by_impl.values()
                       for r in d.values()):
                continue
            fig, ax = plt.subplots(figsize=(7, 4.5))
            for impl, pts in sorted(by_impl.items()):
                xs = sorted(x for x, r in pts.items()
                            if r.get(ykey) is not None)
                if len(xs) < 2:
                    continue
                ax.plot(xs, [pts[x][ykey] for x in xs], marker="o",
                        label=impl)
            ax.set_xlabel(xkey)
            ax.set_ylabel(unit)
            ax.set_title(f"{name} ({fixed}={fv})")
            ax.grid(True, alpha=0.3)
            ax.legend()
            out = os.path.join(out_dir, f"{name}_{ykey}_vs_{xkey}.png")
            fig.savefig(out, dpi=110, bbox_inches="tight")
            plt.close(fig)
            made.append(out)
    return made


def main():
    ap = argparse.ArgumentParser()
    here = os.path.dirname(os.path.abspath(__file__))
    ap.add_argument("--results", default=os.path.join(here, "results"))
    ap.add_argument("--out", default=os.path.join(here, "results", "plots"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    n = 0
    for fn in sorted(os.listdir(args.results)):
        if fn.endswith(".jsonl"):
            made = plot_file(os.path.join(args.results, fn), args.out)
            for m in made or []:
                print("wrote", m)
                n += 1
    print(f"{n} plots")


if __name__ == "__main__":
    main()
