#!/usr/bin/env python3
"""Cross-check graft.Verify output against DuckDB, like the driver does.

usage: check_oracle.py <sfDir> <verifyOutDir>

Registers each <sfDir>/<table>.parquet as a DuckDB view, runs each entry of
<out>/oracle_sql.json, and compares to parquet_scan('<out>/<name>/*.parquet')
with columns sorted by name and floats rounded to 6 decimal places.
"""
import sys, os, json, glob, hashlib
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{p}')"
                if os.path.isfile(p) else
                f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{p}/*.parquet')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

def canon(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    rows = []
    for t in df.itertuples(index=False):
        vals = []
        for v in t:
            if isinstance(v, float):
                vals.append(f"{round(v, 6):.6f}")
            elif isinstance(v, (bytes, bytearray)):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return cols, len(rows), h

fails = 0
for name in sorted(oracle):
    try:
        oc, on, oh = canon(con.sql(oracle[name]))
        sc, sn, sh = canon(con.sql(
            f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')"))
        ok = (oc == sc) and (on == sn) and (oh == sh)
        if not ok:
            fails += 1
            print(f"FAIL {name}: rows {sn}/{on} schema_match={oc==sc} hash_match={oh==sh}")
            if oc != sc:
                print(f"  spark cols:  {sc}\n  oracle cols: {oc}")
        else:
            print(f"ok   {name} ({sn} rows)")
    except Exception as e:
        fails += 1
        print(f"ERR  {name}: {e}")
print(f"\n{len(oracle) - fails}/{len(oracle)} green")
sys.exit(1 if fails else 0)
