#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/oracle_check.py [outDir] [sfDir]
Reads each <outDir>/<name> parquet (written by graft.Verify) and compares it
EXACTLY against the oracle SQL in <outDir>/oracle_sql.json run by DuckDB over
the same sf tables. Columns sorted by name; rows compared as sorted tuples.
Reports per-query: row-count match, schema (column name) match, value match,
and pinpoints first mismatching cell (incl. float ULP diffs).
"""
import sys, json, glob, os, math

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output");  fails += 1;  continue
    got = pq.read_table(files[0])
    try:
        exp = con.sql(oracle[name]).arrow()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}");  fails += 1;  continue
    gcols, ecols = sorted(got.column_names), sorted(exp.column_names)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} != {ecols}");  fails += 1;  continue
    if got.num_rows != exp.num_rows:
        print(f"FAIL {name}: rows {got.num_rows} != {exp.num_rows}");  fails += 1;  continue
    def key(row):
        return tuple((1, "") if v is None else (0, v) for v in row)
    g = sorted((tuple(r[c] for c in gcols) for r in got.to_pylist()), key=key)
    e = sorted((tuple(r[c] for c in ecols) for r in exp.to_pylist()), key=key)
    bad = None
    for i, (gr, er) in enumerate(zip(g, e)):
        for c, (gv, ev) in zip(gcols, zip(gr, er)):
            same = (gv == ev) or (gv is None and ev is None) or (
                isinstance(gv, float) and isinstance(ev, float)
                and math.isnan(gv) and math.isnan(ev))
            if not same:
                bad = (i, c, gv, ev);  break
        if bad: break
    # schema type report (informational)
    tmix = [(c, str(got.schema.field(c).type), str(exp.schema.field(c).type))
            for c in gcols if got.schema.field(c).type != exp.schema.field(c).type]
    if bad:
        i, c, gv, ev = bad
        print(f"FAIL {name}: row {i} col {c}: spark={gv!r} oracle={ev!r}")
        fails += 1
    else:
        note = f"  [type diff: {tmix}]" if tmix else ""
        print(f"OK   {name}: {got.num_rows} rows{note}")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
