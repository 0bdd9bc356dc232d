#!/bin/bash
# Round-close measurement chain: run on a QUIET host, in this order
# (bench first so the driver-comparable number exists even if the
# session is cut; the 3-decade probe last because it is the longest).
# Every artifact carries the hostprobe fixture stamps.
set -x
cd /root/repo
R="${1:?usage: round_close_chain.sh r10}"

SPARK_GRAFT_BENCH_OUT=/root/repo/BENCH_LOCAL_${R}.json \
  python3 bench.py > /tmp/bench_${R}_stdout.json 2>/tmp/bench_${R}.err
echo "BENCH rc=$?"

python3 scripts/dump_plans.py --hashes > /root/repo/PLANSHASH_${R}.json \
  2>/tmp/planshash_${R}.err
echo "PLANSHASH rc=$?"

python3 scripts/driver_sim.py /root/testdata/sf0.01 \
  --emit-json /root/repo/PARITY_${R}.json > /tmp/parity_${R}.log 2>&1
echo "PARITY rc=$?"

python3 scripts/recall_report.py --deep > /root/repo/RECALL_${R}.json \
  2>/tmp/recall_${R}.err
echo "RECALL rc=$?"

SPARK_GRAFT_PROBE_RUNS=1 SPARK_GRAFT_PROBE_SCALES="sf0.1:/root/testdata/sf0.1:1,sf1_probe:/root/repo/scale_probe/sf1:10,sf10_probe:/root/repo/scale_probe/sf10:100" \
  python3 scripts/scale_probe.py > /root/repo/SCALEPROBE_${R}_3pt.json \
  2>/tmp/scale_probe_${R}.err
echo "PROBE rc=$?"

# Deep test tier (round-11 verdict #2): the default `pytest tests/` run
# is the driver-facing fast tier; the endurance soaks run once per
# round here so coverage never depends on the driver's capture window.
SPARK_GRAFT_DEEP_TESTS=1 python3 -m pytest tests/test_versioned_lake.py -q \
  > /tmp/deep_tests_${R}.log 2>&1
echo "DEEPTESTS rc=$?"
echo "CHAIN DONE"
