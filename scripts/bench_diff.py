#!/usr/bin/env python3
"""Cal-aware cross-round bench differ (r18, VERDICT r17 #8).

Compares two bench artifacts (driver BENCH_r{N}.json or a local
bench_last.json) per query, and flags a regression ONLY when both
rounds' reps were calibration-healthy — a per-query uptick whose reps
ran in a provably degraded window (cal_q spiking vs the file's own
median calibration) is box drift, not code, and re-adjudicating it
wastes judge time.

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [--threshold 1.3]
Exit code is always 0 (a reporting tool, not a gate).
"""
import json
import statistics
import sys


def load(path):
    """Extract the bench payload from either artifact shape."""
    d = json.load(open(path))
    # driver shape: {"n":…, "tail": "...json line...", "parsed": {...}}
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]
    if "queries" in d:
        return d
    # find complete JSON object lines in "tail" — prefer the one with
    # the LARGEST query map (r20, ADVICE r19: preferring the LAST line
    # always picked Bench's compact top-N map even when the full map
    # survived the tail whole, blinding the differ to cheap→expensive
    # regressions that only the full map lists on the old side)
    candidates = []
    for line in str(d.get("tail", "")).splitlines():
        line = line.strip().lstrip("[info] ").strip()
        if line.startswith("{") and '"queries"' in line:
            try:
                candidates.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    candidates = [c for c in candidates if isinstance(c.get("queries"), dict)]
    if candidates:
        return max(candidates, key=lambda c: len(c["queries"]))
    # driver BENCH_r{N}.json often truncates the JSON line — recover
    # the per-query medians from the fragment (no cal data survives
    # truncation; healthy() then marks everything healthy, which is
    # the right conservative default for a reporting tool). The
    # fragment is CUT at the first trailing-metadata marker before the
    # regex runs: the "reruns"/"first_total" maps that follow the
    # queries map also match the key:value pattern, and letting them
    # through OVERWRITES genuine medians with rerun counts (the r18
    # phantom-regression defect — vec_quantize_int8 reported 3.00s
    # where the artifact said 0.453s).
    import re
    frag = str(d.get("tail", ""))
    cut = min((i for i in (frag.find('"reruns"'), frag.find('"first_total"'),
                           frag.find('"cal_q"'), frag.find('"bad_runs"'))
               if i >= 0), default=len(frag))
    pairs = re.findall(r'"([a-z][a-z0-9_]+)":([0-9]+\.[0-9]+)', frag[:cut])
    meta = {"value", "sf", "total", "first_total", "cal0", "cpu_total",
            "load", "warm_total"}
    qs = {k: float(v) for k, v in pairs if k not in meta}
    if qs:
        return {"queries": qs}
    raise SystemExit(f"{path}: no bench payload found")


def healthy(payload):
    """Query -> True when every rep's calibration was in the normal
    band (<= 2x the file-wide median cal) and the query hit no
    bad_runs/bad_cal record. Files without cal data mark everything
    healthy (old rounds predate the cal gate)."""
    cal = payload.get("cal_q") or {}
    bad = set(payload.get("bad_runs") or {}) | set(payload.get("bad_cal") or {})
    allcals = [c for reps in cal.values() for c in reps if c and c > 0]
    med = statistics.median(allcals) if allcals else None
    out = {}
    for q in payload.get("queries", {}):
        if q in bad:
            out[q] = False
        elif med and q in cal:
            out[q] = all(c <= 2 * med for c in cal[q] if c and c > 0)
        else:
            out[q] = True
    return out


def main():
    # --threshold accepts both "--threshold=1.3" and "--threshold 1.3"
    # (the space form used to fall into the positional file list and
    # the suffix form silently kept the default)
    argv, args, thr = sys.argv[1:], [], 1.3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--threshold":
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                raise SystemExit("--threshold needs a numeric value")
            try:
                thr = float(argv[i + 1])
            except ValueError:
                raise SystemExit(f"--threshold: not a number: {argv[i + 1]}")
            i += 2
        elif a.startswith("--threshold="):
            thr = float(a.split("=", 1)[1])
            i += 1
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a}")
        else:
            args.append(a)
            i += 1
    if len(args) != 2:
        raise SystemExit("usage: bench_diff.py [--threshold X] OLD.json NEW.json")
    old, new = load(args[0]), load(args[1])
    ho, hn = healthy(old), healthy(new)
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    flagged, drift, improved = [], [], []
    for q in common:
        a, b = qo[q], qn[q]
        if not a or a <= 0:
            continue
        r = b / a
        if r >= thr:
            (flagged if (ho.get(q, True) and hn.get(q, True)) else drift) \
                .append((q, a, b, r))
        elif r <= 1 / thr:
            improved.append((q, a, b, r))
    to, tn = sum(qo[q] for q in common), sum(qn[q] for q in common)
    print(f"common queries: {len(common)}  total {to:.1f}s -> {tn:.1f}s "
          f"({tn / to:.3f}x)")
    added = sorted(set(qn) - set(qo))
    print(f"added: {added}")
    print(f"removed: {sorted(set(qo) - set(qn))}")
    # a query "added" on the new side may really be a cheap→expensive
    # regression whose old median simply fell below a COMPACT old
    # artifact's top-N inclusion floor — surface any added query whose
    # new median clears that floor for adjudication (full-map-vs-
    # full-map diffs never hit this: added then means genuinely new)
    if added and qo:
        floor = min(qo.values())
        suspicious = [(q, qn[q]) for q in added if qn[q] >= max(floor, 0.01)]
        if suspicious:
            print(f"\nadded queries at/above the old artifact's inclusion "
                  f"floor ({floor:.2f}s) — possible cheap→expensive "
                  "regressions if the old artifact was a compact tail:")
            for q, b in sorted(suspicious, key=lambda t: -t[1]):
                print(f"  {q}: (not in old map) -> {b:.2f}s")
    if flagged:
        print(f"\nREGRESSIONS (>= {thr}x, both rounds cal-healthy — adjudicate):")
        for q, a, b, r in sorted(flagged, key=lambda t: -t[3]):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    else:
        print(f"\nno cal-healthy regressions >= {thr}x")
    if drift:
        print(f"\nupticks in CAL-UNHEALTHY windows (box drift, ignore):")
        for q, a, b, r in sorted(drift, key=lambda t: -t[3]):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    if improved:
        print(f"\nimprovements (<= {1/thr:.2f}x):")
        for q, a, b, r in sorted(improved, key=lambda t: t[3]):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")


if __name__ == "__main__":
    main()
