#!/bin/bash
# Round-5 new-kernel ladder chain: sequential single legs via leg_draws.py.
# 32-core first warms the (reboot-wiped) fixture cache at full parallelism;
# then the rungs the new-kernel ladder is missing: 2, 1 (the N legs of the
# two criterion spans), plus top-ups. Each leg appends to BENCH/leg_draws.json.
set -u
cd /root/repo
LOG=/tmp/r5_chain.log
echo "chain start $(date -u +%H:%M:%S)" >> "$LOG"
for cpus in 32 2 1 4 2 1 32 8 16; do
  echo "=== leg cpus=$cpus start $(date -u +%H:%M:%S)" >> "$LOG"
  python scripts/leg_draws.py "$cpus" >> "$LOG" 2>&1
  echo "=== leg cpus=$cpus done  $(date -u +%H:%M:%S) rc=$?" >> "$LOG"
done
echo "chain done $(date -u +%H:%M:%S)" >> "$LOG"
