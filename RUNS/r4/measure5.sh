#!/bin/bash
cd /root/repo
while pgrep -f measure4.sh > /dev/null; do sleep 30; done
# wait for CPU pool equivalence tests before burning TPU time
while pgrep -f "pytest tests/test_march_pool.py" > /dev/null; do sleep 30; done
if tail -2 RUNS/r4/pool_test2.log | grep -q "failed"; then
  echo "pool tests failed; skipping pool TPU measurements"; exit 0
fi
log() { echo "=== $* ($(date +%T)) ==="; }
log pool-direct-bench; DARTRAY_POOL=1 DARTRAY_BENCH_SCATT=0 timeout 2400 python bench.py 2>&1
log pool-scatt-bench; DARTRAY_POOL=1 DARTRAY_BENCH_SCATT_CAP=1500 timeout 3000 python bench.py 2>&1
log done
