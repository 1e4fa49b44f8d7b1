#!/bin/bash
# Watch for an axon tunnel window and run the round-5 measurement sweep
# the moment it opens.  Probes with a long budget (cold device enumeration
# through the tunnel can take minutes); logs every attempt so the round
# record shows when the tunnel was down.
LOG=${LOG:-/tmp/measure_r5.log}
PROBE_LOG=/tmp/tunnel_watch.log
PROBE_BUDGET=${PROBE_BUDGET:-600}
SLEEP_BETWEEN=${SLEEP_BETWEEN:-180}
cd /root/repo
while true; do
  echo "probe start $(date +%H:%M:%S)" >> "$PROBE_LOG"
  if timeout "$PROBE_BUDGET" python -c "
import time, jax
t0=time.time(); d=jax.devices(); print('enum_s', round(time.time()-t0,1), d[0].platform, flush=True)
import jax.numpy as jnp
t0=time.time(); v=float(jnp.sum(jnp.ones((8,8)))); print('op_s', round(time.time()-t0,1), v, flush=True)
assert d[0].platform != 'cpu'
" >> "$PROBE_LOG" 2>&1; then
    echo "TUNNEL UP $(date +%H:%M:%S) - starting sweep" >> "$PROBE_LOG"
    bash scripts/measure_r5.sh
    echo "SWEEP DONE $(date +%H:%M:%S)" >> "$PROBE_LOG"
    break
  fi
  echo "probe failed $(date +%H:%M:%S); retry in ${SLEEP_BETWEEN}s" >> "$PROBE_LOG"
  sleep "$SLEEP_BETWEEN"
done
