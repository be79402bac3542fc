#!/bin/bash
# Block until the axon TPU worker answers a real device op (the relay
# port stays up while the backend hangs — TODO.md infra notes), then
# exit 0. Usage: probe_chip.sh [max_wait_s]
MAX=${1:-3600}
T0=$(date +%s)
while :; do
  timeout 300 python - <<'EOF' >/dev/null 2>&1 && { echo "chip up $(date -u +%T)"; exit 0; }
import jax, numpy as np
d = jax.devices()[0]
# advisor r4 (medium): a CPU fallback (JAX_PLATFORMS unset/multi in a
# lane shell) passes the ones-sum while the TPU backend is down — the
# probe must assert the op ran on the tunnel backend, not any backend
assert d.platform != "cpu", f"probe fell back to {d.platform}"
x = jax.device_put(np.ones((8, 8), np.float32), d)
assert float(jax.device_get(x.sum())) == 64.0
EOF
  NOW=$(date +%s)
  if [ $((NOW - T0)) -ge "$MAX" ]; then echo "chip DOWN after ${MAX}s"; exit 1; fi
  echo "chip not answering $(date -u +%T); sleeping 120"
  sleep 120
done
