#!/bin/bash
cd /root/repo
while pgrep -f measure3.sh > /dev/null; do sleep 30; done
log() { echo "=== $* ($(date +%T)) ==="; }
log scaspe-flat; timeout 2400 python scripts/prof_scaspe.py 2>&1
log march-NR262k; PROF_NR=262144 timeout 1800 python scripts/prof_march.py 2>&1
log done
