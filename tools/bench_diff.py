#!/usr/bin/env python3
"""Per-query bench regression guard (VERDICT r14 §7).

Compares two bench result files and flags >1.25x regressions on entries
whose baseline exceeds 0.2 s (smaller entries live in scheduler-noise
territory; PERF_NOTES documents 0.8-1.27 s rep bands on this box).

Accepts either format:
  - a full Bench.scala JSON line (BENCH_LOCAL.json): {"queries": {...}}
  - a driver round file (BENCH_r{N}.json): {"tail": "<truncated stdout>"}
    -- the driver captures only a 2000-char tail, so per-query pairs are
    regex-recovered from whatever survived truncation; the diff then runs
    on the intersection and REPORTS how many entries each side carried.

Usage: python3 tools/bench_diff.py <baseline.json> <current.json>
       [--ratio 1.25] [--floor 0.2]
Exit code 1 if any regression is flagged (so the end-of-round checklist
can gate on it), 0 otherwise.
"""
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        return {k: float(v) for k, v in d["queries"].items()}
    # driver round file: recover "name":seconds pairs from the tail
    tail = d.get("tail") or ""
    pairs = re.findall(r'"(q_[a-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)', tail)
    if not pairs:
        raise SystemExit(f"{path}: no queries dict and no recoverable tail pairs")
    # the tail is a fixed-size truncation: its LAST pair may have lost
    # digits at the cut ("q_x":1.819 -> "q_x":1.), recovering a wrong
    # seconds value that would flag a false REGRESSED/IMPROVED — keep it
    # only when a clean delimiter (comma/brace) follows the number
    last_name, last_val = pairs[-1]
    if not re.search(
            r'"%s":%s\s*[,}\]]' % (re.escape(last_name), re.escape(last_val)),
            tail):
        pairs = pairs[:-1]
    return {k: float(v) for k, v in pairs}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): float(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    ratio = opts.get("ratio", 1.25)
    floor = opts.get("floor", 0.2)
    if len(args) != 2:
        raise SystemExit(__doc__)
    base, cur = load_queries(args[0]), load_queries(args[1])
    common = sorted(set(base) & set(cur))
    print(f"baseline {args[0]}: {len(base)} entries; "
          f"current {args[1]}: {len(cur)} entries; common {len(common)}")
    flagged = []
    improved = []
    for q in common:
        b, c = base[q], cur[q]
        if b >= floor and c > b * ratio:
            flagged.append((q, b, c, c / b))
        elif c >= floor and b > c * ratio:
            improved.append((q, b, c, c / b))
    tot_b = sum(base[q] for q in common)
    tot_c = sum(cur[q] for q in common)
    print(f"common-subset total: {tot_b:.1f} s -> {tot_c:.1f} s "
          f"({tot_c / tot_b:.2f}x)" if tot_b > 0 else "")
    new = sorted(set(cur) - set(base))
    if new:
        print(f"new entries ({len(new)}): " + ", ".join(
            f"{q}={cur[q]:.2f}s" for q in new))
    gone = sorted(set(base) - set(cur))
    if gone:
        print(f"dropped entries ({len(gone)}): " + ", ".join(gone))
    for q, b, c, r in sorted(improved, key=lambda x: x[3]):
        print(f"IMPROVED {q}: {b:.3f} -> {c:.3f} s ({r:.2f}x)")
    for q, b, c, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"REGRESSED {q}: {b:.3f} -> {c:.3f} s ({r:.2f}x)")
    if not flagged:
        print(f"no regressions > {ratio}x on entries >= {floor}s")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
