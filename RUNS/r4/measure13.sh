#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log final-candidate
DARTRAY_BENCH_SCATT_CAP=900 timeout 1800 python bench.py 2>&1 | tail -8
log done
