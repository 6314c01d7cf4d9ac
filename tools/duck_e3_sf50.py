#!/usr/bin/env python3
"""Time the e3 oracle SQL in DuckDB on .scratch/sf50 (min-of-N)."""
import duckdb, glob, json, os, time, sys

sfdir = "/root/repo/.scratch/sf50"
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")
sql = json.load(open("/tmp/verify_out_001pct/oracle_sql.json"))["e3_q5_multijoin"]
walls = []
for i in range(5):
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    walls.append(round(time.time() - t0, 3))
print(json.dumps({"engine": "duckdb", "query": "e3_q5_multijoin",
                  "sf_dir": sfdir, "walls_s": walls, "min_s": min(walls),
                  "n_rows": len(rows)}))
