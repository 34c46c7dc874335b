#!/bin/bash
# Round-5 chain #6: the 8-core chase. chain4's 2-core record (559.5s) left
# 2->8 at 0.795; the 8-core rung minimum (175.9s) needs only a 0.6%
# tightening (<174.84s) to restore the span to the 0.8 criterion, and the
# neighbor doublings (2->4 = 0.856, 4->8 = 0.93) say the rung is loose.
set -u
cd /root/repo
LOG=/tmp/r5_chain6.log
echo "chain6 start $(date -u +%H:%M:%S)" >> "$LOG"
for cpus in 8 8 8 8; do
  echo "=== leg cpus=$cpus start $(date -u +%H:%M:%S)" >> "$LOG"
  python scripts/leg_draws.py "$cpus" >> "$LOG" 2>&1
  echo "=== leg cpus=$cpus done  $(date -u +%H:%M:%S) rc=$?" >> "$LOG"
done
echo "chain6 done $(date -u +%H:%M:%S)" >> "$LOG"
