#!/bin/bash
# wait until no bench.py process remains, then print both summaries
while ps aux | grep -q "[b]ench.py"; do sleep 20; done
echo "=== bench_final ==="
grep '"metric"' /tmp/bench_final.log | tail -1
echo "=== bench_scaling ==="
grep '"metric"\|"scaling"' /tmp/bench_scaling.log | tail -1
