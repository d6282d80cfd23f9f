#!/usr/bin/env bash
# Crawl throughput at two parallelism levels + harness-query bench.
# Produces /tmp/graft-bench/results.json lines; summary printed at the end.
set -euo pipefail
cd "$(dirname "$0")/.."
ARGS="${CRAWL_ARGS:-64 100000 8 8}"
mkdir -p /tmp/graft-bench
OUT=/tmp/graft-bench/results.jsonl
: > "$OUT"

for CPUS in 8 32; do
  echo "== CrawlBench at local[$CPUS] (args: $ARGS)"
  SPARK_GRAFT_CPUS=$CPUS SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.CrawlBench $ARGS" 2>&1 \
    | grep -E '^\[info\] \{"bench"' | sed 's/^\[info\] //' | tee -a "$OUT"
done

echo "== harness Bench at sf0.1, local[32]"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  sbt -batch "runMain graft.Bench" 2>&1 \
  | grep -E '^\[info\] \{"metric"' | sed 's/^\[info\] //' | tee -a "$OUT"

python3 - "$OUT" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
crawl = {r['cpus']: r for r in rows if r.get('bench') == 'crawl'}
if 8 in crawl and 32 in crawl:
    t8, t32 = crawl[8]['throughput_urls_per_sec'], crawl[32]['throughput_urls_per_sec']
    eff = (t32 / t8) / 4
    print(f"throughput local[8]={t8:.1f} urls/s  local[32]={t32:.1f} urls/s  scaling efficiency={(eff):.3f} (>=0.8 required)")
EOF
