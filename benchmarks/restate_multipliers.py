"""Compute the honest ours-vs-baseline multipliers from the committed
sweeps (VERDICT r4 missing #1): the vendor arm is now TUNED per shape
(jaxfa_tuned.json), so README "~N x" claims must cite these numbers, not
the 128-block default strawman. Prints per-sweep median/min/max speedups
vs the tuned vendor arm and vs exact-XLA, plus the rows used."""
import json
import os
import sys
from collections import defaultdict

RES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
SWEEPS = [
    ("attn_fwd_bf16.jsonl", "fwd noncausal"),
    ("attn_fwd_causal_bf16.jsonl", "fwd causal"),
    ("attn_fwd_bwd_bf16.jsonl", "fwd+bwd noncausal"),
    ("attn_fwd_bwd_causal_bf16.jsonl", "fwd+bwd causal"),
]


def rows(path):
    out = []
    with open(path) as f:
        for line in f:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def main():
    for fname, label in SWEEPS:
        path = os.path.join(RES, fname)
        if not os.path.exists(path):
            continue
        by_shape = defaultdict(dict)
        for r in rows(path):
            if "tflops" in r:
                by_shape[(r["N"], r["D"])][r["impl"]] = r
        vs_jaxfa, vs_xla = [], []
        for (N, D), impls in sorted(by_shape.items()):
            ours = impls.get("ours")
            if not ours:
                continue
            jf, xla = impls.get("jaxfa"), impls.get("xla")
            if jf:
                vs_jaxfa.append((ours["tflops"] / jf["tflops"], N, D,
                                 jf.get("tuned_block")))
            if xla:
                vs_xla.append((ours["tflops"] / xla["tflops"], N, D))
        def summ(xs):
            if not xs:
                return "n/a"
            v = sorted(x[0] for x in xs)
            return (f"median {v[len(v)//2]:.2f}x  min {v[0]:.2f}x  "
                    f"max {v[-1]:.2f}x  (n={len(v)})")
        print(f"== {label}")
        print(f"   vs tuned vendor pallas-fa: {summ(vs_jaxfa)}")
        for m, N, D, tb in vs_jaxfa:
            print(f"      N={N} D={D}: {m:.2f}x (vendor block {tb})")
        print(f"   vs exact-XLA:              {summ(vs_xla)}")


if __name__ == "__main__":
    main()
