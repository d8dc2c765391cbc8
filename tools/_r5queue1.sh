#!/bin/bash
# Round-5 TPU queue #1 (supersedes the never-run _r4queue5.sh):
# 1) on-device kernel parity gate (VERDICT r4 weak #4 — proves fwd+grad
#    parity for conv/ext/pairwise before any timing)
# 2) headline confirm via the default savemid path (expect ~5120)
# 3) savemid per-op trace (_prof2) — round-5 optimization is blind w/o it
# 4) fresh energy_force wall (the 50 ms number predates apply_T+savemid mix)
# 5) diffusion + dipole fresh
# 6) e2e fresh with the faster step (VERDICT next #3 baseline)
# 7) kernel metric refresh (VERDICT next #7)
# ONE CPU: nothing else host-heavy may run while this does
# (flag: /tmp/tpu_bench_running).
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== r5 queue1 start $(date)"
echo "=== parity gate $(date)"
timeout 2700 python bench.py parity
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
echo "=== kernel metric (bench_kernel) $(date)"
timeout 1200 python bench_kernel.py
echo "=== R5 QUEUE1 DONE $(date)"
