#!/usr/bin/env python3
"""The sf>=1 baseline spot-check: at sf0.1 (~100 MB) most per-query
spark/duckdb ratios measure Spark's per-job fixed cost, not plan cost
(BASELINE.md's interpretation paragraph). This tool re-times a small
set of queries where both engines do REAL work — e1 (scan-heavy agg),
e3 (multi-join), c17 (n-gram contamination join), d1 (sessionize
window), c24 (substring-span dedup: the 10x replicas keep their text,
so EVERY span is cross-doc duplicated — the adversarial shape), c25
(BM25 over 10x the postings), c27 (bigram-LM train + score: ~5M
bigram occurrences unnested on the DuckDB side), c28 (DSIR unigram
log-ratios over the same volume), c31 (segment-frequency boilerplate:
the 10x replicas make EVERY segment cross-doc boilerplate — the
adversarial all-boiler shape), c32 (budget selection: global ordered
window vs the bucket-offset decomposition) — on the 10x-replicated
tables of tools/make_sf1.py.

Writes results/sf1_spotcheck.json and rewrites the marker-delimited
sf1 section of BASELINE.md (idempotent; make_baseline.py re-appends
the section from the json on a full regeneration).

Usage:
  python3 tools/make_sf1.py                     # build .scratch/sf1 once (persistent)
  SPARK_GRAFT_BENCH_ONLY=e1_q1_agg,e3_q5_multijoin,c17_contamination,d1_sessionize,c24_substring_dedup,c25_bm25_search,c27_lm_perplexity,c28_dsir_weight,c31_boilerplate,c32_budget_select,c39_bloom_contain,c41_heavy_hitters,c42_trigram_lm \
    SPARK_GRAFT_SF_DIR=.scratch/sf1 sbt "runMain graft.Bench" | grep '"metric"' > /tmp/sf1_bench.json
  python3 tools/sf1_spotcheck.py <oracle_sql.json> [.scratch/sf1] [/tmp/sf1_bench.json]
"""
import duckdb, glob, json, os, sys, time

QUERIES = ["e1_q1_agg", "e3_q5_multijoin", "c17_contamination", "d1_sessionize",
           "c24_substring_dedup", "c25_bm25_search", "c27_lm_perplexity",
           "c28_dsir_weight", "c31_boilerplate", "c32_budget_select",
           "c39_bloom_contain", "c41_heavy_hitters", "c42_trigram_lm"]
RUNS = 3
BEGIN = "<!-- sf1-spotcheck:begin -->"
END = "<!-- sf1-spotcheck:end -->"


def time_query(con, sql, runs):
    """min-of-runs wall seconds with full materialization — the ONE
    timing rule for every DuckDB baseline number (make_baseline.py
    imports this so the TSV and the spot-check cannot drift)."""
    secs = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(sql).fetch_arrow_table()
        secs.append(time.perf_counter() - t0)
    return min(secs)


def table_source(path):
    """A *.parquet entry is either a single file or a directory of
    per-replica files (make_sf1.py writes fact tables multi-file so
    Spark gets real input splits); DuckDB globs the directory."""
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def run_duckdb(sfdir, oracle):
    con = duckdb.connect()
    for f in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(f).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{table_source(f)}'")
        con.execute(f"SELECT count(*) FROM {name}").fetchone()  # warmup
    out = {}
    for key in QUERIES:
        # same failure policy as make_baseline.py: -1 sentinel, never
        # abort — the already-measured queries must survive
        try:
            out[key] = time_query(con, oracle[key], RUNS)
            print(f"{key}\tduckdb {out[key]:.4f}")
        except Exception as e:
            out[key] = -1.0
            print(f"{key}\tFAILED: {e}", file=sys.stderr)
    return out


def sf1_section(spot):
    lines = [BEGIN,
             "",
             "## sf1 spot-check — where both engines do real work",
             "",
             "At sf0.1 most oracle queries finish in DuckDB in <50 ms — the",
             "per-query ratios above measure Spark's per-job fixed cost, not",
             "plan cost. This section re-times the QUERIES list (13 queries) on",
             f"10x-replicated tables (`tools/make_sf1.py`, ~sf1: "
             f"{spot.get('lineitem_rows', '~6M')} lineitem rows), where the",
             "data is large enough for the plans themselves to dominate.",
             "Since round 14 the tables are PERSISTENT (`.scratch/sf1`,",
             "built once, reused across rounds): round 13 measured ~2x wall",
             "swings on unchanged code between per-round /tmp rebuilds, so",
             "cross-round sf1 comparison is only valid against rows produced",
             "from the same persistent build (this one and later).",
             "Produced by `tools/sf1_spotcheck.py`; machine-readable copy:",
             "`results/sf1_spotcheck.json`.",
             "",
             f"| query | duckdb min-of-{RUNS} (s) | spark min-of-{RUNS} (s) | ratio |",
             "|---|---|---|---|"]
    for k in QUERIES:
        d = spot["duckdb"].get(k, -1.0)
        s = spot.get("spark", {}).get(k, -1.0)
        ratio = f"{s / d:.2f}" if d > 0 and s > 0 else "-"
        d_txt = f"{d:.4f}" if d >= 0 else "FAILED"
        s_txt = f"{s:.4f}" if s > 0 else "(run graft.Bench at sf1)"
        lines.append(f"| {k} | {d_txt} | {s_txt} | {ratio} |")
    lines += [
        "",
        "Reading it: where DuckDB's own time is substantial (c17's",
        "n-gram contamination join, tens of seconds), the Spark plan is",
        "competitive-to-faster — plan cost, fairly compared. Rows whose",
        "DuckDB time is still sub-second (a TPC-H agg over ~6M hot",
        "in-cache rows is nothing to measure) keep mostly measuring",
        "Spark's per-job floor even at this scale; the meaningful trend",
        "for those is Spark's near-flat wall under 10x the data (compare",
        "the same queries in BENCH_r{N}.json at sf0.1) while DuckDB's",
        "grows with input — the fixed cost amortizes, the plans scale.",
        "", END]
    return "\n".join(lines) + "\n"


def append_sf1_section(baseline_md="BASELINE.md",
                       spot_path="results/sf1_spotcheck.json"):
    """Rewrite (or append) the marker-delimited sf1 section. Shared with
    make_baseline.py so a full baseline regeneration keeps the section."""
    if not os.path.exists(spot_path):
        return False
    spot = json.load(open(spot_path))
    text = open(baseline_md).read()
    if BEGIN in text and END in text:
        pre = text[:text.index(BEGIN)]
        post = text[text.index(END) + len(END):].lstrip("\n")
        text = pre + sf1_section(spot) + post
    else:
        text = text.rstrip("\n") + "\n\n" + sf1_section(spot)
    open(baseline_md, "w").write(text)
    return True


if __name__ == "__main__":
    oracle_path = sys.argv[1]
    sfdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1")
    bench_json = sys.argv[3] if len(sys.argv) > 3 else None

    oracle = json.load(open(oracle_path))
    duck = run_duckdb(sfdir, oracle)
    spark = {}
    if bench_json and os.path.exists(bench_json):
        # tolerate an sbt [info] prefix AND an empty/garbled file — a
        # stale bench json must degrade to spark={}, not crash after
        # minutes of DuckDB timing
        line = open(bench_json).read().strip().split("\n")[-1]
        if "{" in line:
            bench = json.loads(line[line.index("{"):])
            spark = {k: v for k, v in bench.get("queries", {}).items()
                     if k in QUERIES and v >= 0}
        else:
            print(f"WARNING: {bench_json} has no JSON line; spark side empty",
                  file=sys.stderr)
    con = duckdb.connect()
    nli = con.execute(
        f"SELECT count(*) FROM '{table_source(f'{sfdir}/lineitem.parquet')}'"
    ).fetchone()[0]
    spot = {"sf": os.path.basename(sfdir.rstrip("/")), "runs": RUNS,
            "duckdb_version": duckdb.__version__,
            "lineitem_rows": nli, "duckdb": duck, "spark": spark}
    os.makedirs("results", exist_ok=True)
    with open("results/sf1_spotcheck.json", "w") as f:
        json.dump(spot, f, indent=1, sort_keys=True)
    if append_sf1_section():
        print("updated BASELINE.md sf1 section")
    print(json.dumps({k: {"duckdb": duck[k], "spark": spark.get(k)}
                      for k in QUERIES}, indent=1))
