#!/bin/bash
# Round-5 new-kernel ladder chain #2: tighten the thin rungs.
# Both existing new-kernel 32-core legs were steal-loaded (359.9/459.9 vs the
# 16-core 161.1 record), and the 1-core rung has only 2 draws (its loose min
# makes the 1->4 span read an impossible 1.141). Order: 32 first (fast,
# warms the fixture cache), then 1 (the long leg), then top-ups.
set -u
cd /root/repo
LOG=/tmp/r5_chain2.log
echo "chain2 start $(date -u +%H:%M:%S)" >> "$LOG"
for cpus in 32 1 32 16 8 2 4; do
  echo "=== leg cpus=$cpus start $(date -u +%H:%M:%S)" >> "$LOG"
  python scripts/leg_draws.py "$cpus" >> "$LOG" 2>&1
  echo "=== leg cpus=$cpus done  $(date -u +%H:%M:%S) rc=$?" >> "$LOG"
done
echo "chain2 done $(date -u +%H:%M:%S)" >> "$LOG"
