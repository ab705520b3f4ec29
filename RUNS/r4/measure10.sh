#!/bin/bash
cd /root/repo
while pgrep -f measure9.sh > /dev/null; do sleep 30; done
log() { echo "=== $* ($(date +%T)) ==="; }
log direct-longchunk; DARTRAY_BENCH_SCATT=0 timeout 1500 python bench.py 2>&1 | tail -5
log scatt-longchunk; DARTRAY_BENCH_SCATT_CAP=1500 timeout 2500 python bench.py 2>&1 | tail -6
log done
