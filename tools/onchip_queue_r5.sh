#!/bin/bash
# Round-5 on-chip queue: run as soon as the tunnel recovers (after
# tools/tpu_watch.sh writes /tmp/tpu_alive).  Probes first (they decide
# what lands before the full bench), full bench LAST and by hand.
# Usage: nohup bash tools/onchip_queue_r5.sh > runs/onchip_r5.log 2>&1 &
set -x
cd /root/repo
date -u

# 1. smoke: the tunnel is really back
timeout 600 python generate.py --model smoke --duration 2 --sampling-steps 4 \
  --output /tmp/smoke_r5.gif || exit 1
date -u

# 2. few-step init-phase breakdown (PERF.md r4: 40.7% unexplained)
timeout 1800 python tools/fewstep_tune_probe.py phases 33
date -u

# 3. in-model block-size A/B (land _BLOCK_TABLE entries iff this wins)
timeout 3600 python tools/fewstep_tune_probe.py blocks 33
date -u

# 4. B=2 few-step feasibility (2 streams/chip on the production path)
timeout 3600 python tools/fewstep_tune_probe.py batch 33
date -u
echo QUEUE DONE
