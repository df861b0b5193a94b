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

def main():
    tracked, news = sys.argv[1], sys.argv[2:]
    base = json.load(open(tracked))
    for p in news:
        rec = json.load(open(p))
        if rec["sf"] != base["sf"]:
            sys.exit(f"sf mismatch: {rec['sf']} vs {base['sf']}")
        base["queries"].update(rec["queries"])
    qs = base["queries"]
    base["n"] = len(qs)
    base["total_first"] = round(sum(q["first"] for q in qs.values()
                                    if isinstance(q.get("first"), (int, float))), 3)
    base["total_steady"] = round(sum(q["steady"] for q in qs.values()
                                     if isinstance(q.get("steady"), (int, float))), 3)
    out = {"sf": base["sf"], "n": base["n"], "total_first": base["total_first"],
           "total_steady": base["total_steady"]}
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
