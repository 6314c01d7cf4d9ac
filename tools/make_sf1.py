#!/usr/bin/env python3
"""Materialize an sf1-scale copy of the sf0.1 parquet tables for the
baseline spot-check: every fact table replicated `reps` times (default
10) with consistent key offsets, so joins stay referentially intact
and per-key cardinalities match a genuinely larger corpus; dimension
tables (region/nation/part/embeddings) are copied unchanged.

Fact tables are written as DIRECTORIES of one parquet file per replica
(`{t}.parquet/part-NN.parquet`) — the round-9 spot-check measured
several "plan cost" rows on ONE core because a single-file table gives
Spark a single input split; multi-file tables let both engines use
their full parallelism, so the sf1 ratios measure the plans. Spark
reads the directory natively; the DuckDB side (sf1_spotcheck.py) views
it as `'{dir}/*.parquet'`.

Offsets are max(key)+1 per table, applied to every foreign-key use:
  lineitem : l_orderkey (+orders offset), l_suppkey (+supplier offset)
  orders   : o_orderkey, o_custkey (+customer offset)
  customer : c_custkey
  supplier : s_suppkey
  documents: doc_id   (replicas keep their text — the contamination
             eval set stays doc_id < 20, i.e. fixed, as at sf0.1)
  events   : event_id, user_id (per-user session shapes preserved)

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [reps]

The default destination is PERSISTENT (.scratch/sf1 inside the repo,
gitignored): the round-13 spot-check found ~2x wall swings on unchanged
code between per-round /tmp rebuilds, making cross-round sf1 ratios
unreadable. Building once and reusing the same files (same row-group
layout, same page cache behavior) removes the rebuild as a variable;
the marker file records provenance and makes the build idempotent.
"""
import duckdb, glob, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else     os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scratch", "sf1")
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

marker = os.path.join(dst, ".built")
stamp = f"src={src} reps={reps} tables=10"
if os.path.exists(marker) and open(marker).read().strip() == stamp:
    print(f"{dst} already built ({stamp}); delete {marker} to force a rebuild")
    sys.exit(0)

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for f in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

def offset(table, col):
    return con.execute(f"SELECT max({col}) + 1 FROM {table}").fetchone()[0]

def fresh_dir(path):
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)
    os.makedirs(path)

OK = offset("orders", "o_orderkey")
CK = offset("customer", "c_custkey")
SK = offset("supplier", "s_suppkey")
DK = offset("documents", "doc_id")
EK = offset("events", "event_id")
UK = offset("events", "user_id")

for t in ["region", "nation", "part", "embeddings"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

# per-replica REPLACE clause: each replica lands in its own file, so a
# `reps`-file table gives every reader `reps` input splits
REPL = {
    "lineitem": lambda r: f"l_orderkey + {r * OK} AS l_orderkey, "
                          f"l_suppkey + {r * SK} AS l_suppkey",
    "orders": lambda r: f"o_orderkey + {r * OK} AS o_orderkey, "
                        f"o_custkey + {r * CK} AS o_custkey",
    "customer": lambda r: f"c_custkey + {r * CK} AS c_custkey",
    "supplier": lambda r: f"s_suppkey + {r * SK} AS s_suppkey",
    "documents": lambda r: f"doc_id + {r * DK} AS doc_id",
}
for t, repl in REPL.items():
    d = f"{dst}/{t}.parquet"
    fresh_dir(d)
    for r in range(reps):
        con.execute(
            f"COPY (SELECT * REPLACE ({repl(r)}) FROM {t}) "
            f"TO '{d}/part-{r:02d}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
    print(f"{t}\t{n} rows in {reps} files")

# events goes through pyarrow, not DuckDB: `ts` must STAY parquet
# TIMESTAMP(NANOS) — the Spark reader (Tables.events) reads it as raw
# nanos via nanosAsLong, and DuckDB's writer downcasts to micros.
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ev = pq.read_table(f"{src}/events.parquet")
evdir = f"{dst}/events.parquet"
fresh_dir(evdir)
total = 0
for r in range(reps):
    t = ev
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pc.add(t.column("event_id"), r * EK))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), r * UK))
    pq.write_table(t, f"{evdir}/part-{r:02d}.parquet")
    total += t.num_rows
# events.ts has shipped as TIMESTAMP(NANOS) and as plain micros across
# testdata generations (see Tables.nanosToTimestamp); either is fine —
# what matters is that replication preserved the source encoding.
_src_ts = pq.read_schema(f"{src}/events.parquet").field("ts").type
_dst_ts = pq.read_schema(f"{evdir}/part-00.parquet").field("ts").type
assert _dst_ts == _src_ts, f"ts encoding changed: {_src_ts} -> {_dst_ts}"
print(f"events\t{total} rows in {reps} files (ts kept {_dst_ts})")
print(f"wrote {reps}x replicas of {src} to {dst}")
# coverage check: every source table must have landed in dst — a table
# added to testdata later must fail THIS build loudly, not surface as a
# missing-table error in some sf1 query with no hint the build is stale
import glob as _glob
_src_tables = {os.path.basename(f) for f in _glob.glob(f"{src}/*.parquet")}
_dst_tables = {os.path.basename(f) for f in _glob.glob(f"{dst}/*.parquet")}
_missing = _src_tables - _dst_tables
assert not _missing, (
    f"sf1 build incomplete: {sorted(_missing)} exist in {src} but were "
    "not replicated — extend the REPL/dimension lists in make_sf1.py")

with open(marker, "w") as f:
    f.write(stamp + "\n")
