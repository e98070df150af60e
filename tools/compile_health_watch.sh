#!/bin/bash
# Poll remote-compile health; when a fresh small compile lands < $THRESH s,
# fire the round-5b on-chip queue (block A/Bs) then the full bench.
# Usage: nohup bash tools/compile_health_watch.sh > runs/health_watch.log 2>&1 &
THRESH=${THRESH:-25}
cd /root/repo
while true; do
  date -u
  T=$(timeout 600 python - <<'EOF' 2>/dev/null
import time, random, jax, jax.numpy as jnp, numpy as np
jax.devices()
x = jnp.ones((256, 256), jnp.bfloat16)
c = np.float32(random.random() + 1.0)   # unique constant -> guaranteed fresh compile
t0 = time.time()
f = jax.jit(lambda a: (a @ a) * c)
float(jnp.sum(f(x)))
print(f"{time.time()-t0:.1f}")
EOF
)
  echo "fresh-compile ${T:-TIMEOUT} s (threshold $THRESH)"
  if [ -n "$T" ] && python -c "exit(0 if float('$T') < $THRESH else 1)" 2>/dev/null; then
    echo "HEALTHY — firing round-5b queue"
    bash tools/onchip_queue_r5b.sh >> runs/onchip_r5b.log 2>&1
    echo "queue done rc=$?; running full bench"
    timeout 5400 python bench.py > runs/bench_r5b.log 2>&1
    echo "bench rc=$?"
    date -u
    exit 0
  fi
  sleep 240
done
