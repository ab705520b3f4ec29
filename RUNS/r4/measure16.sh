#!/bin/bash
cd /root/repo
log() { echo "=== $* ($(date +%T)) ==="; }
log final-driver-bench
timeout 1800 python bench.py 2>&1 | tail -9
log done
