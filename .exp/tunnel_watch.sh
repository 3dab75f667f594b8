#!/bin/bash
# Probes the axon TPU tunnel every 120s; logs first success and exits.
LOG=/root/repo/.exp/tunnel_watch.log
echo "watch start $(date -u +%FT%TZ)" >> "$LOG"
while true; do
  if [ -f /root/repo/.exp/qstop ]; then echo "qstop $(date -u +%FT%TZ)" >> "$LOG"; exit 0; fi
  timeout 150 python -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
import jax.numpy as jnp
assert int(jnp.arange(8).sum()) == 28
print('OK', d)
" >> "$LOG" 2>&1
  if [ $? -eq 0 ]; then echo "TUNNEL UP $(date -u +%FT%TZ)" >> "$LOG"; exit 0; fi
  echo "down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 120
done
