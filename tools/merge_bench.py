#!/usr/bin/env python3
"""Merge per-query bench records (graft.Bench output files).

Usage: merge_bench.py TRACKED NEW [NEW...]

Each NEW file's queries are merged into TRACKED: a query present in a
NEW file replaces the TRACKED entry entirely (the new measurement is on
newer code / a quieter machine — keeping a stale min would hide
regressions). Totals and n are recomputed from the merged map; the sf
field must agree across inputs. Written for the 100x/1000x subset
records, where supplemental runs cover queries the main sweep missed
and must never clobber the rest of the tracked file.
"""
import json, sys

# The pinned DRIFT CALIBRATION set: trivial queries no round's operator
# work touches, so a steady-time ratio between the incoming record and
# the tracked one measures the BOX, not the code (r15's cross-round
# verdict had to hand-pick exactly such queries to dismiss a phantom
# 1.28x "regression"). The merged record carries the median ratio as
# drift_vs_prev; cross-round comparisons divide by it mechanically.
CALIBRATION = ["q1_agg", "q22_anti", "dedup_exact", "meta_stream_info",
               "corpus_stats"]

def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

def main():
    tracked, news = sys.argv[1], sys.argv[2:]
    base = json.load(open(tracked))
    drift = None
    for p in news:
        rec = json.load(open(p))
        if rec["sf"] != base["sf"]:
            sys.exit(f"sf mismatch: {rec['sf']} vs {base['sf']}")
        ratios = {q: round(rec["queries"][q]["steady"]
                           / base["queries"][q]["steady"], 3)
                  for q in CALIBRATION
                  if isinstance(rec["queries"].get(q, {}).get("steady"),
                                (int, float))
                  and isinstance(base["queries"].get(q, {}).get("steady"),
                                 (int, float))
                  and base["queries"][q]["steady"] > 0}
        if len(ratios) >= 3:
            drift = {"ratio": round(median(ratios.values()), 3),
                     "set": ratios}
        base["queries"].update(rec["queries"])
    qs = base["queries"]
    base["n"] = len(qs)
    base["total_first"] = round(sum(q["first"] for q in qs.values()
                                    if isinstance(q.get("first"), (int, float))), 3)
    base["total_steady"] = round(sum(q["steady"] for q in qs.values()
                                     if isinstance(q.get("steady"), (int, float))), 3)
    out = {"sf": base["sf"], "n": base["n"], "total_first": base["total_first"],
           "total_steady": base["total_steady"]}
    if drift is not None:
        out["drift_vs_prev"] = drift
    elif base.get("drift_vs_prev") is not None:
        out["drift_vs_prev"] = base["drift_vs_prev"]
    # carry the machine-state note if any input had one (newest wins);
    # per-query provenance differences stay visible in the run files
    for src in [base] + [json.load(open(p)) for p in news]:
        if src.get("provenance") not in (None, "unspecified"):
            out["provenance"] = src["provenance"]
    lines = [f'  "{k}": {json.dumps(qs[k], separators=(", ", ": "))}'
             for k in sorted(qs)]
    body = ("{\n" + "\n".join(f'"{k}": {json.dumps(v)},' for k, v in out.items())
            + "\n\"queries\": {\n" + ",\n".join(lines) + "\n}}\n")
    open(tracked, "w").write(body)
    print(f"merged {len(news)} file(s) -> {tracked}: n={base['n']}, "
          f"total_steady={base['total_steady']}")

if __name__ == "__main__":
    main()
