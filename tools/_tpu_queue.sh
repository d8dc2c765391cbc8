#!/bin/bash
# Round-3 TPU bench queue — run once when the tunnel returns.
# ONE CPU: nothing else host-heavy may run while this does
# (flag: /tmp/tpu_bench_running).
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== queue start $(date)"
echo "=== headline (config_energy) $(date)"
timeout 1500 python bench.py
echo "=== hamiltonian b16 (pairwise kernel default-on) $(date)"
timeout 2700 python bench.py hamiltonian 16
echo "=== hamiltonian b16 ablation: E3_PALLAS_PAIRWISE=0 $(date)"
E3_PALLAS_PAIRWISE=0 timeout 1500 python bench.py hamiltonian 16
echo "=== energy_force (apply_T radial MLP) $(date)"
timeout 2400 python bench.py energy_force
echo "=== diffusion $(date)"
timeout 1500 python bench.py diffusion
echo "=== e2e trainer-path $(date)"
timeout 1800 python bench.py e2e
echo "=== DONE $(date)"
rm -f /tmp/tpu_bench_running
