#!/bin/bash
cd /root/repo
while pgrep -f measure5b.sh > /dev/null; do sleep 20; done
log() { echo "=== $* ($(date +%T)) ==="; }
log scatt-debug-rounds
DARTRAY_DEBUG_ROUNDS=1 DARTRAY_BENCH_SCATT_CAP=900 timeout 1800 python bench.py 2>&1 | tail -250
log done
