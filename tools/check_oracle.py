#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each
SparkEntry.oracleSql in DuckDB over the sf tables, compare with the
parquet written by graft.Verify (columns sorted by name, rows sorted by
a total repr key, values compared with exact equality — the oracle SQL
quantizes/ROUND()s every float itself, so no tolerance is applied here;
an unrounded float column in a future oracle will rightly FAIL on
summation-order ULPs rather than be papered over).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

# The b5/b5b oracles use DuckDB's two-parameter indexed list lambda
# ((f, i) -> ...) and // integer division; c23/c34/c35 use recursive
# CTEs over LIST/STRUCT state. All are DuckDB >= 0.10 features — fail
# LOUDLY on version drift instead of as an opaque oracle mismatch.
_ver = tuple(int(x) for x in duckdb.__version__.split(".")[:2])
assert _ver >= (0, 10), (
    f"DuckDB {duckdb.__version__} too old for the oracle SQL dialect "
    "(needs >= 0.10: indexed list lambdas, // division, recursive CTE "
    "list state)")

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    # directory-style tables (make_sf1.py's multi-file layout) glob
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for key, sql in sorted(oracle.items()):
    got_dir = f"{outdir}/{key}"
    if not os.path.isdir(got_dir):
        print(f"FAIL {key}: no spark output"); fails += 1; continue
    try:
        exp = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {key}: oracle error {e}"); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM '{got_dir}/*.parquet'").fetch_arrow_table()
    except Exception as e:
        # one unreadable output dir must record a FAIL, not abort the
        # gate for the ~100 other queries
        print(f"FAIL {key}: spark output unreadable {e}"); fails += 1; continue
    ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
    if ecols != gcols:
        print(f"FAIL {key}: cols {gcols} != {ecols}"); fails += 1; continue
    etypes = [str(exp.schema.field(c).type) for c in ecols]
    gtypes = [str(got.schema.field(c).type) for c in gcols]
    if etypes != gtypes:
        print(f"FAIL {key}: types {gtypes} != {etypes}"); fails += 1; continue
    def canon(v):
        # the SORT KEY must be consistent with the row comparison's ==,
        # which treats -0.0 == 0.0 (IEEE): DuckDB's ROUND preserves the
        # zero's sign (ROUND(-2e-5, 4) = -0.0) while Spark's
        # BigDecimal-backed round() never emits -0.0, so sorting by raw
        # repr misaligns an otherwise equal-multiset block and cascades
        # into hundreds of phantom "mismatches" (first seen: a6 at
        # sf0.1, ONE -0.0/0.0 pair -> 1012 misaligned rows). Normalize
        # zero signs (recursively, for list/struct cells) in the key
        # only; the equality check below stays exact.
        if isinstance(v, float):
            return v + 0.0 if v == 0.0 else v
        if isinstance(v, list):
            return [canon(x) for x in v]
        if isinstance(v, dict):
            return {k: canon(x) for k, x in v.items()}
        return v

    def rowkey(row):
        # total order over ANY value shape (None inside lists, structs
        # decoded to dicts): repr is deterministic for identical data,
        # and both sides sort with the same key, so equal multisets of
        # rows always align
        return tuple((v is None, repr(canon(v))) for v in row)
    e_rows = sorted([tuple(r[c] for c in ecols) for r in exp.to_pylist()], key=rowkey)
    g_rows = sorted([tuple(r[c] for c in gcols) for r in got.to_pylist()], key=rowkey)
    if len(e_rows) != len(g_rows):
        print(f"FAIL {key}: rows {len(g_rows)} != {len(e_rows)}"); fails += 1; continue
    bad = [(a, b) for a, b in zip(e_rows, g_rows) if a != b]
    if bad:
        print(f"FAIL {key}: {len(bad)} mismatched rows; first: exp={bad[0][0]} got={bad[0][1]}")
        fails += 1
    else:
        print(f"OK   {key} ({len(g_rows)} rows)")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
