#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log direct-adaptive; DARTRAY_BENCH_SCATT=0 timeout 1500 python bench.py 2>&1 | tail -6
log scatt-adaptive; DARTRAY_BENCH_SCATT_CAP=1500 timeout 2400 python bench.py 2>&1 | tail -8
log done
