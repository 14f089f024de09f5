#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each
oracle_sql.json entry in DuckDB over the sf dir's parquet tables and
compare (rows, schema, value hash) against the Spark dumps from
graft.Verify. Usage: oracle_check.py <sfDir> <verifyOutDir>"""
import sys, os, json, glob
import duckdb

sf, out = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def canon(rel):
    cols = sorted(rel.columns)
    rows = [tuple(str(r[rel.columns.index(c)]) for c in cols) for r in rel.fetchall()]
    return cols, sorted(rows)

fails = []
for q in sorted(os.listdir(out)):
    d = os.path.join(out, q)
    if not os.path.isdir(d):
        continue
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    scols, srows = canon(spark_rel)
    if q not in oracle:
        print(f"{q:24s} rows-only rows={len(srows)}")
        continue
    try:
        ocols, orows = canon(con.sql(oracle[q]))
    except Exception as e:
        fails.append(q)
        print(f"{q:24s} ORACLE-ERROR {e}")
        continue
    ok = scols == ocols and srows == orows
    if not ok:
        fails.append(q)
        print(f"{q:24s} MISMATCH spark_rows={len(srows)} oracle_rows={len(orows)}")
        if scols != ocols:
            print(f"  schema: spark={scols} oracle={ocols}")
        else:
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            extra_s = [r for r in srows if r not in orows][:3]
            extra_o = [r for r in orows if r not in srows][:3]
            print(f"  first diffs: {diff}\n  spark-only: {extra_s}\n  oracle-only: {extra_o}")
    else:
        print(f"{q:24s} MATCH rows={len(srows)}")
print(f"\n{'FAIL: ' + ','.join(fails) if fails else 'ALL MATCH'}")
sys.exit(1 if fails else 0)
