#!/bin/bash
# Round-4 TPU bench queue #1: hamiltonian with the pairwise kernel default-on.
# ONE CPU: nothing else host-heavy may run while this does
# (flag: /tmp/tpu_bench_running).
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== queue start $(date)"
echo "=== hamiltonian b16 (pairwise kernel default-on) $(date)"
timeout 2700 python bench.py hamiltonian 16
echo "=== DONE $(date)"
