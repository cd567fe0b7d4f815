#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output against DuckDB oracles and compare (columns sorted by name,
rows sorted, values compared)."""
import duckdb, json, sys, glob, math

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {str(e)[:200]}")); continue
    try:
        sdf = duckdb.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append((name, f"spark output missing: {str(e)[:120]}")); continue
    o = odf.reindex(sorted(odf.columns), axis=1)
    s = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(o.columns) != list(s.columns):
        fails.append((name, f"schema: oracle={list(o.columns)} spark={list(s.columns)}")); continue
    if len(o) != len(s):
        fails.append((name, f"rows: oracle={len(o)} spark={len(s)}")); continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    mismatch = None
    for c in o.columns:
        ov, sv = o[c].tolist(), s[c].tolist()
        for i, (a, b) in enumerate(zip(ov, sv)):
            if a is None and b is None: continue
            try:
                if isinstance(a, float) or isinstance(b, float):
                    an = (a is None) or (isinstance(a,float) and math.isnan(a))
                    bn = (b is None) or (isinstance(b,float) and math.isnan(b))
                    if an and bn: continue
                    if an != bn or a != b:
                        mismatch = f"col {c} row {i}: oracle={a!r} spark={b!r}"; break
                elif a != b:
                    mismatch = f"col {c} row {i}: oracle={a!r} spark={b!r}"; break
            except Exception as e:
                mismatch = f"col {c} row {i}: cmp error {e}"; break
        if mismatch: break
    if mismatch: fails.append((name, mismatch))
    else: passes.append((name, len(o)))
for n, k in passes: print(f"PASS {n} ({k} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
