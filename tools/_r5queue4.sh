#!/bin/bash
# Round-5 TPU queue #4: grad2-klayout (the force path consuming/emitting
# the kernel-layout node table; every kl leg there is pure XLA so the
# handoff differentiates to any order) — hardware A/B + trace.
# Run AFTER the CPU parity suite is green on the new code.
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== r5 queue4 start $(date)"
echo "=== energy_force grad2-klayout ON (default) $(date)"
timeout 1800 python bench.py energy_force
echo "=== energy_force grad2-klayout ON repeat $(date)"
timeout 1800 python bench.py energy_force
echo "=== energy_force E3_KLAYOUT=0 control $(date)"
E3_KLAYOUT=0 timeout 1800 python bench.py energy_force
echo "=== energy_force per-op trace (klayout on) $(date)"
timeout 1800 python tools/_efprof.py
echo "=== headline regression check $(date)"
timeout 1200 python bench.py
echo "=== parity gate $(date)"
timeout 2400 python bench.py parity
echo "=== R5 QUEUE4 DONE $(date)"
