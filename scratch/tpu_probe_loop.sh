#!/bin/bash
# probe the axon tunnel every 4 min; on first UP, launch the work queue
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
print(float(jnp.arange(64.0).sum()))
" >/dev/null 2>&1; then
    echo "$(date +%H:%M:%S) UP" >> /tmp/tpu_status.log
    if [ ! -f /tmp/tpu_queue_launched ]; then
      touch /tmp/tpu_queue_launched
      nohup /tmp/tpu_work_queue.sh > /tmp/tpu_queue.log 2>&1 &
      echo "$(date +%H:%M:%S) QUEUE LAUNCHED" >> /tmp/tpu_status.log
    fi
  else
    echo "$(date +%H:%M:%S) DOWN" >> /tmp/tpu_status.log
  fi
  sleep 240
done
