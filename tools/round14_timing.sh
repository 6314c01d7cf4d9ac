#!/bin/bash
# Round-14 serialized timing phase — run uncontended (nothing else on
# the machine). Order matters: sidecars first, then the DuckDB
# baseline over them, then the Spark bench snapshot, then the sf1
# spot-check on the persistent .scratch/sf1 tables.
set -e -o pipefail
cd /root/repo
exec > /tmp/round14_timing.log 2>&1

echo "=== [1/4] Verify at sf0.1 (refresh oracle sidecars) ==="
rm -rf /tmp/verify_sf01
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_sf01" | tail -2

echo "=== [2/4] make_baseline at sf0.1 (min-of-3, full oracle surface) ==="
python3 tools/make_baseline.py /root/testdata/sf0.1 /tmp/verify_sf01/oracle_sql.json 3

echo "=== [3/4] bench snapshot (full suite, min-of-3) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" | grep -F '"metric"' > results/bench_r14.json
cat results/bench_r14.json

echo "=== [4/4] sf1 spot-check on the persistent tables ==="
python3 tools/make_sf1.py   # idempotent: millisecond no-op when built
SPARK_GRAFT_BENCH_ONLY=e1_q1_agg,e3_q5_multijoin,c17_contamination,d1_sessionize,c24_substring_dedup,c25_bm25_search,c27_lm_perplexity,c28_dsir_weight,c31_boilerplate,c32_budget_select,c39_bloom_contain,c41_heavy_hitters,c42_trigram_lm \
  SPARK_GRAFT_SF_DIR=/root/repo/.scratch/sf1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" | grep -F '"metric"' > /tmp/sf1_bench.json
python3 tools/sf1_spotcheck.py /tmp/verify_sf01/oracle_sql.json /root/repo/.scratch/sf1 /tmp/sf1_bench.json

echo "=== DONE ==="
