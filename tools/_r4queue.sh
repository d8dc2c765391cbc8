#!/bin/bash
# Round-4 TPU queue #2: pairwise on-device parity, hamiltonian with the
# batched TPExpansion lowering (kernel default + XLA ablation), e2e
# dropped-graphs/gap split, headline re-measure.
# ONE CPU: nothing else host-heavy may run while this does
# (flag: /tmp/tpu_bench_running).
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== queue start $(date)"
echo "=== pairwise kernel on-device parity $(date)"
timeout 1500 python tools/_pwparity.py
echo "=== hamiltonian b16 (kernel default, batched-lowering build) $(date)"
timeout 2700 python bench.py hamiltonian 16
echo "=== hamiltonian b16 ablation E3_PALLAS_PAIRWISE=0 (batched lowering) $(date)"
E3_PALLAS_PAIRWISE=0 E3_PALLAS_EDGECONV=0 timeout 2700 python bench.py hamiltonian 16
echo "=== e2e trainer path $(date)"
timeout 1800 python bench.py e2e
echo "=== headline config_energy $(date)"
timeout 1200 python bench.py
echo "=== DONE $(date)"
