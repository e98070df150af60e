#!/bin/bash
# Round-5b on-chip queue — the measurements still owed after the 08-20
# early-morning run (runs/onchip_r5.log):
#   * the 50-step int8 window re-measure (the 04:30 run read 1480 s for a
#     WARM window — 8.5x the day-4 number on identical code; bench now
#     re-measures once on anomaly and records both)
#   * the 50-step groups' flash block-size A/B (tools/fps_blocks_probe.py
#     — never ran on chip; the 04:28 JSON was the MMPL_PROBE_TINY smoke)
#   * the few-step warmup-shape block A/B (exact-divisor candidates,
#     legalized dispatch)
# Full bench LAST and by hand.
# Usage: nohup bash tools/onchip_queue_r5b.sh > runs/onchip_r5b.log 2>&1 &
set -x
cd /root/repo
date -u

# 1. 50-step block-size A/B, anchor group first (biggest padding waste)
timeout 5400 python tools/fps_blocks_probe.py 1
date -u
timeout 5400 python tools/fps_blocks_probe.py 2 3
date -u

# 2. few-step warmup-shape candidates (exact divisors only)
timeout 3600 python tools/fewstep_tune_probe.py blocks 33
date -u

echo QUEUE DONE
