#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log scatt-hostlum
DARTRAY_DEBUG_ROUNDS=1 DARTRAY_BENCH_SCATT_CAP=1200 timeout 2000 python bench.py 2>&1 | tail -60
log done
