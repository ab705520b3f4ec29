#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log warm-cache-repeat
DARTRAY_BENCH_SCATT_CAP=1400 timeout 2200 python bench.py 2>&1 | tail -8
log done
