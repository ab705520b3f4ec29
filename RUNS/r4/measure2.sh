#!/bin/bash
cd /root/repo
# wait for measure1 to finish (pid file not tracked; poll for 'done' marker)
while ! grep -q "^=== done" RUNS/r4/measure1.log 2>/dev/null; do sleep 20; done
log() { echo "=== $* ($(date +%T)) ==="; }
log loops;   timeout 1800 python scripts/prof_loops.py 2>&1
log scaspe;  timeout 2400 python scripts/prof_scaspe.py 2>&1
log march-NR262k; PROF_NR=262144 timeout 1800 python scripts/prof_march.py 2>&1
log done
