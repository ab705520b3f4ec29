#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log pool-direct-bench; DARTRAY_POOL=1 DARTRAY_BENCH_SCATT=0 timeout 2400 python bench.py 2>&1
log plain-bench-cachecheck; DARTRAY_BENCH_SCATT=0 timeout 2400 python bench.py 2>&1
log done
