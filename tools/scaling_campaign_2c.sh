#!/bin/bash
# Round-5 phase-2 campaign: 2-core configs only. The 4cp/4cpL pools
# (33/12 attempts) already establish the 16-streaming-core bandwidth
# wall; the remaining sampling budget goes to the configs that can
# clear the bar on a clean median — 2cp (pre-registered short job) and
# 2cpL (trap-#6-amortized long job, clean median 0.811/3 when this
# phase started). Same serialization discipline as scaling_campaign.sh.
set -u
cd /root/repo
N="${1:-8}"
for i in $(seq 1 "$N"); do
  echo "=== 2c iteration $i/$N $(date -u +%H:%M:%S) ==="
  timeout 2400 python bench.py --scaling-executors 2 480000 --pinned \
    > "/tmp/c2_2cp_$i.json" 2>"/tmp/c2_2cp_$i.err"
  SPARK_GRAFT_CFG_SUFFIX=L timeout 3000 \
    python bench.py --scaling-executors 2 1440000 --pinned \
    > "/tmp/c2_2cpL_$i.json" 2>"/tmp/c2_2cpL_$i.err"
  if (( i % 3 == 1 )); then
    timeout 1500 python bench.py --steady \
      > "/tmp/c2_steady_$i.json" 2>"/tmp/c2_steady_$i.err"
  fi
  git add BENCH/state.json || true
  git add BENCH/BASELINE.md || true
  git commit -q -m "Scaling ledger: 2-core campaign iteration $i" || true
done
echo "2c campaign done"
