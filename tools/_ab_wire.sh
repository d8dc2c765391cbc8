#!/bin/bash
# A/B the GraphBatch wire-format producer path (E3_WIRE) on bench.py e2e.
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
: > /tmp/ab_wire.log
for run in A B; do
  for w in 1 0; do
    echo "=== wire=$w run $run ===" >> /tmp/ab_wire.log
    E3_WIRE=$w timeout 1500 python bench.py e2e >> /tmp/ab_wire.log 2>&1
    echo exit=$? >> /tmp/ab_wire.log
  done
done
echo ALLDONE >> /tmp/ab_wire.log
