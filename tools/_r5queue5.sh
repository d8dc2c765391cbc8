#!/bin/bash
# Round-5 TPU queue #5 (final): re-run the headline regression check that
# hit a transient tunnel outage in queue4 (02:16-02:36 UTC: zero output,
# parity ran fine right after), then a long convergence soak — the
# committed accuracy-evidence number (still descending at 60 epochs).
# May run under pytest contention: read the DEVICE ms for comparisons.
cd /root/repo
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== r5 queue5 start $(date)"
echo "=== headline regression check (grad2-klayout code) $(date)"
timeout 1800 python bench.py
echo "=== headline repeat $(date)"
timeout 1800 python bench.py
echo "=== long convergence soak $(date)"
E3_SOAK_EPOCHS=600 timeout 7200 python tools/_converge.py
echo "=== R5 QUEUE5 DONE $(date)"
