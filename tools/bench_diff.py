#!/usr/bin/env python3
"""Per-query bench regression guard (VERDICT r14 §7; calibrated r18).

Compares two bench result files and flags regressions on entries whose
baseline exceeds 0.2 s (smaller entries live in scheduler-noise
territory; PERF_NOTES documents 0.8-1.27 s rep bands on this box).

MACHINE CALIBRATION (r18, VERDICT task 4): graft.Bench times a pinned
set of untouched scan/join/agg/window queries FIRST and LAST around the
headline passes and emits them as a trailing "calibration" block. When
both files carry the block, the machine-speed factor is the median
ratio over the calibration queries (per query: min of first/last —
steady state); when either side lacks it (pre-r18 baselines), the
factor falls back to the median ratio over ALL common entries >= floor
— the r17 hand-argument, made mechanical. Output shows RAW and
ADJUSTED ratios; only calibration-adjusted regressions flag (exit 1).

Accepts either format:
  - a full Bench.scala JSON line (BENCH_LOCAL.json): {"queries": {...}}
  - a driver round file (BENCH_r{N}.json): {"tail": "<truncated stdout>"}
    -- the driver captures only a 2000-char tail, so per-query pairs are
    regex-recovered from whatever survived truncation; the diff then runs
    on the intersection and REPORTS how many entries each side carried.
    The calibration block rides at the END of the line precisely so it
    survives the tail cut; it is parsed structurally and then removed
    before pair recovery (its entries repeat headline names).

Usage: python3 tools/bench_diff.py <baseline.json> <current.json>
       [--ratio 1.25] [--floor 0.2]
Exit code 1 if any adjusted regression is flagged (so the end-of-round
checklist can gate on it), 0 otherwise.
"""
import json
import re
import statistics
import sys


def load_queries(path):
    """Return (queries dict, calibration dict-or-None)."""
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        cal = d.get("calibration")
        return {k: float(v) for k, v in d["queries"].items()}, cal
    # driver round file: recover "name":seconds pairs from the tail
    tail = d.get("tail") or ""
    cal = None
    idx = tail.find('"calibration":')
    if idx >= 0:
        try:
            cal, _ = json.JSONDecoder().raw_decode(
                tail, idx + len('"calibration":'))
        except ValueError:
            cal = None  # block itself truncated: ignore it
        # strip the block either way — its entries repeat headline names
        # and the last regex occurrence would otherwise win
        tail = tail[:idx]
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
    return {k: float(v) for k, v in pairs}, cal


def steady(cal):
    """Per calibration query: min(first, last) = steady-state time."""
    first, last = cal.get("first") or {}, cal.get("last") or {}
    return {q: min(float(first[q]), float(last.get(q, first[q])))
            for q in first}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0].lstrip("-"): float(a.split("=")[1])
            for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    ratio = opts.get("ratio", 1.25)
    floor = opts.get("floor", 0.2)
    if len(args) != 2:
        raise SystemExit(__doc__)
    (base, bcal), (cur, ccal) = load_queries(args[0]), load_queries(args[1])
    common = sorted(set(base) & set(cur))
    print(f"baseline {args[0]}: {len(base)} entries; "
          f"current {args[1]}: {len(cur)} entries; common {len(common)}")

    # ---- machine-speed factor ----
    factor, source = 1.0, "none"
    if bcal and ccal:
        bs, cs = steady(bcal), steady(ccal)
        cq = sorted(set(bs) & set(cs))
        if cq:
            ratios = {q: cs[q] / bs[q] for q in cq}
            factor = statistics.median(ratios.values())
            source = "calibration"
            print("calibration ratios: " + ", ".join(
                f"{q}={ratios[q]:.2f}" for q in cq))
            # in-run drift: a large last/first spread means the CURRENT
            # run's environment moved mid-measurement
            last, first = ccal.get("last") or {}, ccal.get("first") or {}
            drift = max((float(last[q]) / float(first[q])
                         for q in first if q in last), default=1.0)
            if drift > ratio:
                print(f"WARNING: current-run calibration drift {drift:.2f}x "
                      "(last vs first) — environment moved mid-run")
    if source == "none":
        cand = [cur[q] / base[q] for q in common if base[q] >= floor]
        if cand:
            factor = statistics.median(cand)
            source = "median-of-common (no calibration block on both sides)"
            # TRUST BAND: the all-entries median cannot distinguish a
            # slower box from a uniform genuine regression (a code change
            # slowing EVERYTHING 1.4x would set factor=1.4 and absolve
            # itself). Modest drift is overwhelmingly environmental
            # (PERF_NOTES history: 0.93-1.14 across rounds); outside the
            # band, gate on RAW ratios and demand a human/calibrated
            # adjudication. Calibration-sourced factors (pinned untouched
            # queries) are exempt — that is the point of the block.
            if not (0.75 <= factor <= 1.25):
                print(f"WARNING: fallback factor {factor:.3f} outside the "
                      "trust band [0.75, 1.25] — either the environment "
                      "shifted drastically or the change is a UNIFORM "
                      "regression; gating on RAW ratios (factor forced "
                      "to 1.0). Re-run against a calibrated baseline to "
                      "adjudicate.")
                factor = 1.0
                source = "raw (fallback factor outside trust band)"
    print(f"machine-speed factor: {factor:.3f} (source: {source})")

    flagged = []
    improved = []
    for q in common:
        b, c = base[q], cur[q]
        adj = c / factor
        if b >= floor and adj > b * ratio:
            flagged.append((q, b, c, c / b, adj / b))
        elif adj >= floor and b > adj * ratio:
            improved.append((q, b, c, c / b, adj / b))
    tot_b = sum(base[q] for q in common)
    tot_c = sum(cur[q] for q in common)
    if tot_b > 0:
        print(f"common-subset total: {tot_b:.1f} s -> {tot_c:.1f} s "
              f"(raw {tot_c / tot_b:.2f}x, adjusted "
              f"{tot_c / factor / tot_b:.2f}x)")
    new = sorted(set(cur) - set(base))
    if new:
        print(f"new entries ({len(new)}): " + ", ".join(
            f"{q}={cur[q]:.2f}s" for q in new))
    gone = sorted(set(base) - set(cur))
    if gone:
        print(f"dropped entries ({len(gone)}): " + ", ".join(gone))
    for q, b, c, raw, adj in sorted(improved, key=lambda x: x[4]):
        print(f"IMPROVED {q}: {b:.3f} -> {c:.3f} s "
              f"(raw {raw:.2f}x, adjusted {adj:.2f}x)")
    for q, b, c, raw, adj in sorted(flagged, key=lambda x: -x[4]):
        print(f"REGRESSED {q}: {b:.3f} -> {c:.3f} s "
              f"(raw {raw:.2f}x, adjusted {adj:.2f}x)")
    if not flagged:
        print(f"no adjusted regressions > {ratio}x on entries >= {floor}s")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
