#!/usr/bin/env python3
"""Materialize a documents-only scale slice for the LM-family (c27 /
c28 / c42) perf adjudication: the round-14 verdict's one perf-weak row
(c42, 3.03x at sf1) carries a floor-profile claim — per-stage
scheduling on a sub-second DuckDB denominator — that can only be
proven at a scale where DuckDB itself does multi-second work. These
queries read ONLY `documents`, so the slice replicates that one table
(`reps` copies, doc_id offset per replica, one parquet file per
replica for input-split parallelism — the make_sf1.py discipline) and
skips the other nine.

Like .scratch/sf1, the destination is PERSISTENT and idempotent: same
files, same row-group layout across rounds, so cross-round walls stay
comparable.

Usage: python3 tools/make_lm_slice.py [srcDir] [dstDir] [reps]
Defaults: /root/testdata/sf0.1  .scratch/sf5lm  50   (~sf5: 250k docs)
"""
import duckdb, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch", "sf5lm")
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 50

marker = os.path.join(dst, ".built")
stamp = f"src={src} reps={reps} tables=documents"
if os.path.exists(marker) and open(marker).read().strip() == stamp:
    print(f"{dst} already built ({stamp}); delete {marker} to force a rebuild")
    sys.exit(0)

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{src}/documents.parquet'")
off = con.execute("SELECT max(doc_id) + 1 FROM documents").fetchone()[0]

tdir = os.path.join(dst, "documents.parquet")
if os.path.isdir(tdir):
    shutil.rmtree(tdir)
os.makedirs(tdir)
for r in range(reps):
    con.execute(
        f"COPY (SELECT doc_id + {r * off} AS doc_id, * EXCLUDE (doc_id) "
        f"FROM documents) TO '{tdir}/part-{r:02d}.parquet' (FORMAT PARQUET)")
n = con.execute(f"SELECT count(*) FROM '{tdir}/*.parquet'").fetchone()[0]
with open(marker, "w") as f:
    f.write(stamp + "\n")
print(f"built {tdir}: {n} docs ({reps} replicas of {src})")
