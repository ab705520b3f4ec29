#!/bin/bash
cd /root/repo
while pgrep -f measure10.sh > /dev/null; do sleep 30; done
log() { echo "=== $* ($(date +%T)) ==="; }
log direct-lazylum; DARTRAY_BENCH_SCATT=0 timeout 1500 python bench.py 2>&1 | tail -4
log scatt-debug2
DARTRAY_DEBUG_ROUNDS=1 DARTRAY_BENCH_SCATT_CAP=1200 timeout 2000 python bench.py 2>&1 | tail -400
log done
