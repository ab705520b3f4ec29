#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log scatt-gaptimers
DARTRAY_DEBUG_ROUNDS=1 DARTRAY_BENCH_SCATT_CAP=420 timeout 1200 python bench.py 2>&1 | tail -150
log done
