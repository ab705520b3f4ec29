#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log pool-spawncond
DARTRAY_POOL=1 DARTRAY_BENCH_SCATT=0 timeout 1500 python bench.py 2>&1 | tail -5
log done
