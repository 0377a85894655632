#!/bin/bash
# Round-5 serialized scaling campaign.
#
# Invariants (learned the hard way in rounds 3-4, see BENCH/BASELINE.md):
#   - STRICTLY one benchmark process at a time; nothing else on this
#     host may run Spark while an invocation is in flight (three
#     round-4 attempts were tainted by concurrent check_oracle runs).
#   - Every invocation appends to BENCH/state.json's round-long ledger
#     (exec_attempt_log / steady_log) and re-renders BENCH/BASELINE.md;
#     the ledger is committed after each iteration so no window's
#     evidence is lost if the session dies.
#   - Configs are the two pre-registered geometries: 2cp (2-core
#     symmetric-pinned executors -- the 4-way leg keeps total streaming
#     cores below the measured single-host bandwidth wall) and 4cp
#     (4-core fair-fit). The steady probe brackets the engine number
#     with the host's cache-resident and memory-streaming capacity.
set -u
cd /root/repo
N="${1:-10}"
for i in $(seq 1 "$N"); do
  echo "=== iteration $i/$N $(date -u +%H:%M:%S) ==="
  # 2-core configs first: their 4-way legs stay under the single-host
  # bandwidth wall, so they are the pools that can realistically reach
  # the pre-registered clean-median target on this box
  timeout 2400 python bench.py --scaling-executors 2 480000 --pinned \
    > "/tmp/camp_2cp_$i.json" 2>"/tmp/camp_2cp_$i.err"
  SPARK_GRAFT_CFG_SUFFIX=L timeout 3000 \
    python bench.py --scaling-executors 2 1440000 --pinned \
    > "/tmp/camp_2cpL_$i.json" 2>"/tmp/camp_2cpL_$i.err"
  timeout 2400 python bench.py --scaling-executors 4 800000 --pinned \
    > "/tmp/camp_4cp_$i.json" 2>"/tmp/camp_4cp_$i.err"
  SPARK_GRAFT_CFG_SUFFIX=L timeout 3000 \
    python bench.py --scaling-executors 4 3200000 --pinned \
    > "/tmp/camp_4cpL_$i.json" 2>"/tmp/camp_4cpL_$i.err"
  if (( i % 3 == 1 )); then
    timeout 1500 python bench.py --steady \
      > "/tmp/camp_steady_$i.json" 2>"/tmp/camp_steady_$i.err"
  fi
  if (( i % 3 == 2 )); then
    timeout 2400 python bench.py --scaling 4 16 \
      > "/tmp/camp_jvm_$i.json" 2>"/tmp/camp_jvm_$i.err"
  fi
  # NOTE: one pathspec per git add — a single add with a missing
  # pathspec (the round-5 bug: BENCH/SCALING*.md never existed) makes
  # git stage NOTHING and every iteration commit silently no-op.
  git add BENCH/state.json || true
  git add BENCH/BASELINE.md || true
  git commit -q -m "Scaling ledger: serialized campaign iteration $i" || true
done
echo "campaign done"
