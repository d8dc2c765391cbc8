#!/bin/bash
# Round-4 TPU queue #3 (fresh /tmp, cold compile cache):
# 1) e2e wire-format A/B (built last session, never measured)
# 2) energy_force per-op trace (guides the second-order batching work)
# 3) headline re-measure (confirm 4512 with secpack default-off)
# ONE CPU: nothing else host-heavy may run while this does
# (flag: /tmp/tpu_bench_running).
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== queue start $(date)"
echo "=== e2e wire=1 (default) $(date)"
timeout 1500 python bench.py e2e
echo "=== e2e wire=0 ablation $(date)"
E3_WIRE=0 timeout 1500 python bench.py e2e
echo "=== energy_force per-op trace $(date)"
timeout 1800 python tools/_efprof.py
echo "=== headline config_energy $(date)"
timeout 1200 python bench.py
echo "=== DONE $(date)"
echo "=== headline per-op trace (_prof2) $(date)"
timeout 1200 python tools/_prof2.py
echo "=== QUEUE3 ALL DONE $(date)"
