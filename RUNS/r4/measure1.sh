#!/bin/bash
# Sequential TPU measurements (ONE client at a time; generous timeouts)
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log prims2;    timeout 1500 python scripts/prof_prims2.py 2>&1
log while;     timeout 1500 python scripts/prof_while.py 2>&1
log march-base; timeout 1800 python scripts/prof_march.py 2>&1
log march-noscatter; DARTRAY_ABLATE=noscatter timeout 1800 python scripts/prof_march.py 2>&1
log march-NR16k; PROF_NR=16384 timeout 1800 python scripts/prof_march.py 2>&1
log pool-bench; DARTRAY_POOL=1 DARTRAY_BENCH_SCATT=0 timeout 2400 python bench.py 2>&1
log done
