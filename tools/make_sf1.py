#!/usr/bin/env python3
"""Materialize an sf1-scale copy of the sf0.1 parquet tables for the
baseline spot-check: every fact table replicated `reps` times (default
10) with consistent key offsets, so joins stay referentially intact
and per-key cardinalities match a genuinely larger corpus; dimension
tables (region/nation/part/embeddings) are copied unchanged.

Offsets are max(key)+1 per table, applied to every foreign-key use:
  lineitem : l_orderkey (+orders offset), l_suppkey (+supplier offset)
  orders   : o_orderkey, o_custkey (+customer offset)
  customer : c_custkey
  supplier : s_suppkey
  documents: doc_id   (replicas keep their text — the contamination
             eval set stays doc_id < 20, i.e. fixed, as at sf0.1)
  events   : event_id, user_id (per-user session shapes preserved)

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [reps]
"""
import duckdb, glob, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for f in glob.glob(f"{src}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

def offset(table, col):
    return con.execute(f"SELECT max({col}) + 1 FROM {table}").fetchone()[0]

OK = offset("orders", "o_orderkey")
CK = offset("customer", "c_custkey")
SK = offset("supplier", "s_suppkey")
DK = offset("documents", "doc_id")
EK = offset("events", "event_id")
UK = offset("events", "user_id")

for t in ["region", "nation", "part", "embeddings"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

REPL = {
    "lineitem": f"l_orderkey + r*{OK} AS l_orderkey, l_suppkey + r*{SK} AS l_suppkey",
    "orders": f"o_orderkey + r*{OK} AS o_orderkey, o_custkey + r*{CK} AS o_custkey",
    "customer": f"c_custkey + r*{CK} AS c_custkey",
    "supplier": f"s_suppkey + r*{SK} AS s_suppkey",
    "documents": f"doc_id + r*{DK} AS doc_id",
}
for t, repl in REPL.items():
    con.execute(
        f"COPY (SELECT * EXCLUDE (r) REPLACE ({repl}) FROM {t} "
        f"CROSS JOIN (SELECT unnest(range({reps})) AS r)) "
        f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"{t}\t{n} rows")

# events goes through pyarrow, not DuckDB: `ts` must STAY parquet
# TIMESTAMP(NANOS) — the Spark reader (Tables.events) reads it as raw
# nanos via nanosAsLong, and DuckDB's writer downcasts to micros.
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ev = pq.read_table(f"{src}/events.parquet")
replicas = []
for r in range(reps):
    t = ev
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pc.add(t.column("event_id"), r * EK))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), r * UK))
    replicas.append(t)
out = pa.concat_tables(replicas)
pq.write_table(out, f"{dst}/events.parquet")
# events.ts has shipped as TIMESTAMP(NANOS) and as plain micros across
# testdata generations (see Tables.nanosToTimestamp); either is fine —
# what matters is that replication preserved the source encoding.
_src_ts = pq.read_schema(f"{src}/events.parquet").field("ts").type
_dst_ts = pq.read_schema(f"{dst}/events.parquet").field("ts").type
assert _dst_ts == _src_ts, f"ts encoding changed: {_src_ts} -> {_dst_ts}"
print(f"events\t{out.num_rows} rows (ts kept {_dst_ts})")
print(f"wrote {reps}x replicas of {src} to {dst}")
