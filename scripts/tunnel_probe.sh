#!/bin/bash
# Probe the axon TPU tunnel every 2 minutes; log status lines to
# /tmp/tunnel_status.log. Stops after ~11 hours.
LOG=/tmp/tunnel_status.log
for i in $(seq 1 330); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8,8)))), jax.devices()[0].platform)
" >/tmp/tunnel_probe_out.txt 2>&1; then
    echo "$(date +%H:%M:%S) UP $(tail -1 /tmp/tunnel_probe_out.txt)" >> $LOG
  else
    echo "$(date +%H:%M:%S) DOWN" >> $LOG
  fi
  sleep 120
done
