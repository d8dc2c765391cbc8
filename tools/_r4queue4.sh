#!/bin/bash
# Round-4 TPU queue #4: waits for queue #3, then
# 1) CPU parity tests for the new SAVEMID conv mode (interpret)
# 2) SAVEMID headline A/B on the chip
# 3) wire=1 e2e hang repro with periodic stack dumps (E3_FAULT)
cd /root/repo
while [ -f /tmp/tpu_bench_running ]; do sleep 20; done
touch /tmp/tpu_bench_running
trap 'rm -f /tmp/tpu_bench_running' EXIT
echo "=== queue4 start $(date)"
echo "=== savemid CPU parity tests $(date)"
timeout 900 python -m pytest tests/test_pallas.py -q -k savemid -x
echo "savemid tests exit=$?"
echo "=== headline SAVEMID=1 $(date)"
E3_PALLAS_SAVEMID=1 timeout 1200 python bench.py
echo "=== headline SAVEMID=1 again (variance) $(date)"
E3_PALLAS_SAVEMID=1 timeout 1200 python bench.py
echo "=== headline default again (A/B interleave) $(date)"
timeout 1200 python bench.py
echo "=== e2e wire=1 repro with stack dumps $(date)"
E3_WIRE=1 E3_FAULT=120 timeout 700 python bench.py e2e
echo "=== QUEUE4 DONE $(date)"
