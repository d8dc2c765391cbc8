#!/bin/bash
# Round-5 TPU queue #2:
# 1) headline with the kernel-layout handoff ON (E3_KLAYOUT=1, r5 new:
#    gated features stream between layers in node-table layout, both
#    transpose legs + their adjoints drop out) — A/B vs queue1's 5118.5
# 2) klayout per-op trace if the A/B wins
# 3) energy_force with ext savemid ON (A/B vs queue1's 1681 g/s @ OFF)
# 4) energy_force per-op trace with ext savemid ON (where did the
#    38 ms go; queue1 carried no force trace)
# 5) hamiltonian b16 fresh (VERDICT next #6 baseline: g/s + first-step
#    compile seconds are both printed)
# ONE CPU: nothing else host-heavy may run while this does
# (flag: /tmp/tpu_bench_running).
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== r5 queue2 start $(date)"
echo "=== headline E3_KLAYOUT=1 $(date)"
E3_KLAYOUT=1 timeout 1200 python bench.py
echo "=== headline E3_KLAYOUT=1 repeat $(date)"
E3_KLAYOUT=1 timeout 1200 python bench.py
echo "=== headline E3_KLAYOUT=0 interleave control $(date)"
timeout 1200 python bench.py
echo "=== klayout per-op trace $(date)"
E3_KLAYOUT=1 timeout 1200 python tools/_prof2.py
echo "=== energy_force SAVEMID_EXT=1 $(date)"
E3_PALLAS_SAVEMID_EXT=1 timeout 1800 python bench.py energy_force
echo "=== energy_force SAVEMID_EXT=1 repeat $(date)"
E3_PALLAS_SAVEMID_EXT=1 timeout 1800 python bench.py energy_force
echo "=== energy_force per-op trace SAVEMID_EXT=1 $(date)"
E3_PALLAS_SAVEMID_EXT=1 timeout 1800 python tools/_efprof.py
echo "=== hamiltonian b16 $(date)"
timeout 2400 python bench.py hamiltonian 16
echo "=== R5 QUEUE2 DONE $(date)"
