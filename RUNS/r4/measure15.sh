#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log driver-config-bench
timeout 1500 python bench.py 2>&1 | tail -8
log full-iteration-3600
DARTRAY_BENCH_SCATT_CAP=3600 timeout 4500 python bench.py 2>&1 | tail -8
log done
