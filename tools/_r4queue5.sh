#!/bin/bash
# Round-4 TPU queue #5: savemid is now DEFAULT —
# 1) headline confirm via the default path (expect ~5120)
# 2) savemid per-op trace (where did the step go from 28.2 -> 24.8 device)
# 3) fresh energy_force wall (the 50 ms number is r3-stale; device is 37.9)
# 4) diffusion + dipole fresh (their first-order paths gain savemid too)
# 5) e2e fresh with the faster step
# ONE CPU: nothing else host-heavy may run while this does
# (flag: /tmp/tpu_bench_running).
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== queue5 start $(date)"
echo "=== headline (savemid default) $(date)"
timeout 1200 python bench.py
echo "=== savemid per-op trace (_prof2) $(date)"
timeout 1200 python tools/_prof2.py
echo "=== energy_force fresh wall $(date)"
timeout 1800 python bench.py energy_force
echo "=== diffusion $(date)"
timeout 1200 python bench.py diffusion
echo "=== dipole $(date)"
timeout 1200 python bench.py dipole
echo "=== e2e $(date)"
timeout 1500 python bench.py e2e
echo "=== QUEUE5 DONE $(date)"
