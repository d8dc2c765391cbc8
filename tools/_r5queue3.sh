#!/bin/bash
# Round-5 TPU queue #3 (after queue2: klayout default-on @ 5269.9 g/s):
# 1) headline re-confirm under committed defaults
# 2) energy_force batch-128 A/B vs the batch-64 37.85 ms (fixed ~6 ms of
#    copy/async/unattributed should amortize; VERDICT next #2)
# 3) e2e trainer-path with klayout on, E3_PREFETCH 2 vs 3 (VERDICT next
#    #3: >=95% of step-only; r5q1 measured 94.9% pre-klayout)
# 4) diffusion + dipole refresh under the new defaults
# 5) multi-hour convergence soak — final val MAE is the committed
#    accuracy-evidence number (VERDICT next #4)
# ONE CPU: nothing else host-heavy while this runs
# (flag: /tmp/tpu_bench_running).
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== r5 queue3 start $(date)"
echo "=== headline (committed defaults) $(date)"
timeout 1200 python bench.py
echo "=== energy_force b128 $(date)"
timeout 1800 python bench.py energy_force 128
echo "=== energy_force b128 repeat $(date)"
timeout 1800 python bench.py energy_force 128
echo "=== energy_force b64 control $(date)"
timeout 1800 python bench.py energy_force
echo "=== e2e PREFETCH=2 $(date)"
timeout 1800 python bench.py e2e
echo "=== e2e PREFETCH=3 $(date)"
E3_PREFETCH=3 timeout 1800 python bench.py e2e
echo "=== diffusion $(date)"
timeout 1200 python bench.py diffusion
echo "=== dipole $(date)"
timeout 1200 python bench.py dipole
echo "=== convergence soak $(date)"
E3_SOAK_EPOCHS=${E3_SOAK_EPOCHS:-60} timeout 10800 python tools/_converge.py
echo "=== R5 QUEUE3 DONE $(date)"
