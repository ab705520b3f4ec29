#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log march-NR262k; PROF_NR=262144 timeout 1800 python scripts/prof_march.py 2>&1
log bench-full-scatt; DARTRAY_BENCH_SCATT_CAP=3000 timeout 3600 python bench.py 2>&1
log done
