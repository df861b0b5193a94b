#!/usr/bin/env python3
"""Sharded wrapper around check.py's comparison loop: runs shard i of N
of the oracle queries (sorted by name) so the sf0.1 gate — ~3.8 h
single-flight, dominated by independent DuckDB replays — finishes in
wall/N on an idle many-core box. Same strict bitwise compare as
check.py. Usage: check_shard.py <sfdir> <verify_out_dir> <i> <n>"""
import json, sys, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, outdir, shard, nshards = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(oracle)[shard::nshards]
fails = []
for name in names:
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name} (no spark output)", flush=True); fails.append(name); continue
    try:
        got = pd.read_parquet(f"{outdir}/{name}")
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}", flush=True); fails.append(name); continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(exp.columns)}", flush=True)
        fails.append(name); continue
    if len(got) != len(exp):
        print(f"ROWS     {name}: spark={len(got)} oracle={len(exp)}", flush=True); fails.append(name); continue
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    ok = True
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if gv.dtype.kind == 'f':
                a = np.asarray(gv, dtype=np.float64)
                b = np.asarray(pd.to_numeric(ev), dtype=np.float64)
                same = a.tobytes() == b.tobytes()
            else:
                same = gv.equals(ev) or (gv.astype(str) == ev.astype(str)).all()
        except Exception:
            same = False
        if not same:
            ok = False
            print(f"VALUES   {name}.{c}", flush=True)
    if ok:
        print(f"OK       {name} ({len(got)} rows)", flush=True)
    else:
        fails.append(name)
print(f"\nshard {shard}/{nshards}: {len(names)-len(fails)}/{len(names)} passed" +
      (f"; FAILED: {fails}" if fails else ""), flush=True)
sys.exit(1 if fails else 0)
