#!/bin/bash
# Probe the tunneled TPU every 5 min until it answers; log recovery time.
# Usage: bash tools/tpu_watch.sh  (run in background; writes /tmp/tpu_alive on success)
rm -f /tmp/tpu_alive
while true; do
  if timeout 150 python - <<'EOF' 2>/dev/null
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform == "tpu"
x = jnp.ones((128, 128))
assert float(jnp.sum(jax.jit(lambda a: a @ a)(x))) > 0
EOF
  then
    date -u +"%Y-%m-%dT%H:%M:%SZ TPU ALIVE" | tee /tmp/tpu_alive
    exit 0
  fi
  date -u +"%Y-%m-%dT%H:%M:%SZ still wedged" >> /tmp/tpu_watch.log
  sleep 300
done
