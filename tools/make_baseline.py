#!/usr/bin/env python3
"""Produce the numeric wall-time baseline the bar's "within 2x of
BASELINE.md" clause is judged against: DuckDB wall times for every
SparkEntry.oracleSql query, on the same parquet tables and the same
machine the Spark bench runs on.

Protocol (mirrors graft.Bench): a warmup pass opens every table once,
then each query runs N times (default 3) with full materialization
(fetch_arrow_table) and reports the per-query MIN.

Usage: python3 tools/make_baseline.py <sfDir> <oracle_sql.json> [runs]
Writes: BASELINE.md (human) + results/baseline_duckdb.tsv (read by
graft.Bench to emit spark-total / duckdb-total in the bench JSON).
"""
import sys, json, glob, os, time, platform
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sf1_spotcheck import append_sf1_section, table_source, time_query

sfdir = sys.argv[1]
oracle_path = sys.argv[2]
runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

# capture the PRE-regen BASELINE.md now, before the overwrite below:
# the marker-block restore at the bottom must see blocks appended
# since the last commit (the adjudicate -> regen -> commit-once flow),
# so reading HEAD there is not enough
try:
    with open("BASELINE.md") as _f:
        pre_regen_baseline = _f.read()
except OSError:
    pre_regen_baseline = ""

con = duckdb.connect()
threads = con.execute("SELECT current_setting('threads')").fetchone()[0]
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{table_source(f)}'")

# warmup: touch every table's BYTES once (page cache), not just its
# footer — DuckDB answers count(*) from row-group metadata without
# reading data pages, so the old count-based warmup left the first
# timed run paying cold I/O; min-of-3 hid it, runs=1 would not
for f in glob.glob(f"{sfdir}/*.parquet"):
    files = glob.glob(f"{f}/*.parquet") if os.path.isdir(f) else [f]
    for part in files:
        with open(part, "rb") as fh:
            while fh.read(1 << 22):
                pass
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"SELECT count(*) FROM {name}").fetchone()

oracle = json.load(open(oracle_path))
results = {}
for key, sql in sorted(oracle.items()):
    # Failure policy mirrors graft.Bench: a failing query records -1 and
    # is excluded from the total, never aborts the run (totals stay
    # comparable engine-to-engine).
    try:
        results[key] = time_query(con, sql, runs)
        print(f"{key}\t{results[key]:.4f}")
    except Exception as e:
        results[key] = -1.0
        print(f"{key}\tFAILED: {e}", file=sys.stderr)

total = sum(v for v in results.values() if v >= 0)
n_ok = sum(1 for v in results.values() if v >= 0)
sf = os.path.basename(sfdir.rstrip("/"))

os.makedirs("results", exist_ok=True)
with open("results/baseline_duckdb.tsv", "w") as f:
    f.write(f"# duckdb={duckdb.__version__} threads={threads} sf={sf} runs={runs}\n")
    for k, v in sorted(results.items()):
        f.write(f"{k}\t{v:.4f}\n")

with open("BASELINE.md", "w") as f:
    f.write(f"""# BASELINE — single-node DuckDB wall times

The numeric baseline for the bar's "BENCH within 2x of BASELINE at the
same scale factor" clause. The reference repo's own published numbers
(results/exrabitq/*.csv) are QPS curves for d=1536 OpenAI embeddings,
which the zero-egress sandbox cannot reproduce (see SURVEY SS6 for that
comparison via `results/sweep_d1536.csv`); for the relational/pipeline
surface, the honest same-machine, same-data baseline is DuckDB -- a
state-of-the-art single-node OLAP engine -- running the exact oracle SQL
of every hash-verified query.

**Protocol** (mirrors `graft.Bench`): DuckDB {duckdb.__version__}, {threads} threads,
{sf} parquet tables (identical files the Spark bench reads), one warmup
pass over every table, then min of {runs} runs per query with full
result materialization. Produced by `tools/make_baseline.py`; the
machine-readable copy is `results/baseline_duckdb.tsv`, which
`graft.Bench` reads to report `spark_oracle_total_sec` /
`duckdb_total_sec` / `vs_baseline` in the bench JSON line.

Queries without a SQL oracle (k-means / rotation / LSH / ANN search /
streaming state -- the rows-only set) have no DuckDB equivalent and are
excluded; their regression tracking is round-over-round BENCH_r{{N}}.json
plus the golden snapshots.

| query | duckdb min-of-{runs} (s) |
|---|---|
""")
    for k, v in sorted(results.items()):
        f.write(f"| {k} | {'FAILED' if v < 0 else f'{v:.4f}'} |\n")
    f.write(f"| **total ({n_ok} queries)** | **{total:.4f}** |\n")
    dedup_total = sum(results.get(k, 0) for k in
                      ("c19_verified_neardup", "c20_dedup_canonical",
                       "c23_semdedup", "c9_doc_fingerprint")
                      if results.get(k, -1) >= 0)
    f.write(f"""
Machine: {platform.platform()}, {os.cpu_count()} CPUs.

**Reading the oracle-formulation outliers honestly**:
c19_verified_neardup, c20_dedup_canonical, c23_semdedup and
c9_doc_fingerprint account for {dedup_total:.1f} s of the {total:.1f} s
total. Their DuckDB times measure the *oracle formulation* -- a
deliberately brute-force all-pairs jaccard (c19), a recursive-CTE
transitive closure (c20), a round-by-round recursive replay of the
sequential greedy scan (c23), and an exact-hugeint per-window hash
fold (c9) -- written to be obviously-correct reference SQL, while the
Spark side runs the real algorithms (LSH candidate generation +
verified pairs; distributed min-label propagation with pointer
jumping; one within-cluster greedy pass; the compiled rolling-hash
kernel). Those rows certify correctness of the Spark results, not
competitive DuckDB wall-time; on the remaining queries the two
engines run genuinely comparable plans. They also dominate
the total's RUN-TO-RUN variance: consecutive quiet-machine
regenerations have moved c19/c20 by 15-25% (e.g. 252 -> 303 s across
round-12 regens), so small vs_baseline shifts between rounds are
denominator noise -- compare per-query Spark walls, and use the sf1
spot-check below for the honest engine-vs-engine read.

Interpretation: DuckDB is an in-process columnar engine with zero
per-query scheduling overhead; Spark pays JVM job scheduling, codegen,
and shuffle machinery per query. At sf0.1 (~100 MB) that fixed cost
dominates most queries, so spark/duckdb ratios here are an upper bound
that shrinks as data grows -- the Spark plans' asymptotics (scan-bounded,
broadcast joins, partial aggregation) are audited per-operator in
SURVEY SS6. The 2x bar is evaluated on the totals ratio reported by
`graft.Bench`.
""")

# keep the sf1 spot-check section (tools/sf1_spotcheck.py) across full
# regenerations of BASELINE.md
if append_sf1_section():
    print("re-appended sf1 spot-check section from results/sf1_spotcheck.json")

# ...and every OTHER marker-delimited block the previous BASELINE.md
# carried (lm-scale-adjudication, scale-adjudication-r16, any future
# one) — the r16 regen silently dropped two adjudication blocks
# because only the sf1 section had a re-append hook. Restore source is
# the file contents captured at script start (NOT git HEAD): a block
# appended after the last commit must survive the regen too.
import re
try:
    cur = open("BASELINE.md").read()
    restored = []
    for m in re.finditer(r"<!-- ([\w-]+):begin -->.*?<!-- \1:end -->",
                         pre_regen_baseline, re.DOTALL):
        tag = m.group(1)
        if f"<!-- {tag}:begin -->" not in cur:
            cur += "\n" + m.group(0) + "\n"
            restored.append(tag)
    if restored:
        with open("BASELINE.md", "w") as f:
            f.write(cur)
        print(f"re-appended marker blocks: {', '.join(restored)}")
except Exception as e:  # a fresh repo must not fail the regen
    print(f"marker-block restore skipped: {e}")

print(f"\ntotal {total:.4f} s over {n_ok} queries -> BASELINE.md + results/baseline_duckdb.tsv")
