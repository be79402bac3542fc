#!/bin/bash
# Block until the axon TPU worker answers a real device op (the relay
# port stays up while the backend hangs — TODO.md infra notes), then
# exit 0. Usage: probe_chip.sh [max_wait_s]
MAX=${1:-3600}
T0=$(date +%s)
while :; do
  timeout 300 python - <<'EOF' >/dev/null 2>&1 && { echo "chip up $(date -u +%T)"; exit 0; }
import jax, numpy as np
x = jax.device_put(np.ones((8, 8), np.float32))
assert float(jax.device_get(x.sum())) == 64.0
EOF
  NOW=$(date +%s)
  if [ $((NOW - T0)) -ge "$MAX" ]; then echo "chip DOWN after ${MAX}s"; exit 1; fi
  echo "chip not answering $(date -u +%T); sleeping 120"
  sleep 120
done
