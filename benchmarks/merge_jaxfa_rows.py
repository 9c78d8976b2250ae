"""Merge refreshed (tuned) jaxfa rows from a sweep log into a committed
sweep jsonl, keeping the existing ours/xla rows in place."""
import json
import sys


def main(log_path, jsonl_path):
    new_jaxfa = {}
    with open(log_path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("impl") == "jaxfa":
                new_jaxfa[(r.get("N"), r.get("D"), r.get("causal"),
                           r.get("mode"))] = r
    out, used = [], set()
    with open(jsonl_path) as f:
        for line in f:
            r = json.loads(line)
            key = (r.get("N"), r.get("D"), r.get("causal"), r.get("mode"))
            if r.get("impl") == "jaxfa" and key in new_jaxfa:
                r = new_jaxfa[key]   # replace EVERY old row for this shape
                used.add(key)
            out.append(r)
    # append refreshed rows that had no previous counterpart
    out.extend(v for k, v in new_jaxfa.items() if k not in used)
    with open(jsonl_path, "w") as f:
        for r in out:
            f.write(json.dumps(r) + "\n")
    print(f"merged into {jsonl_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
