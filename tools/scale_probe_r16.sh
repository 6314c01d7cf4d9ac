#!/bin/bash
# Round-16 scale probe refresh on shipped code: the standard 100k-doc
# run then the 500k/1M 100x run, strictly sequential (sbt lock).
set -e
cd /root/repo
sbt -batch "runMain graft.ScaleProbe" 2>/dev/null | grep -F '"probe"' \
  | sed 's/^\[info\] //' > results/scale_probe_r16.json
SPARK_GRAFT_PROBE_DOCS=500000 SPARK_GRAFT_PROBE_VECS=1000000 \
  sbt -batch "runMain graft.ScaleProbe" 2>/dev/null | grep -F '"probe"' \
  | sed 's/^\[info\] //' > results/scale_probe_r16_500k.json
echo DONE
