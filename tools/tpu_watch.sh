#!/bin/bash
# Poll the TPU tunnel; when it answers, run the round-4 backlog once.
log=/tmp/tpu_watch.log
echo "=== watcher start $(date +%H:%M:%S) ===" >> $log
while true; do
  out=$(timeout 120 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null | tail -1)
  if [ "$out" = "axon" ] || [ "$out" = "tpu" ]; then
    echo "tunnel UP ($out) at $(date +%H:%M:%S)" >> $log
    bash /tmp/tpu_backlog.sh
    echo "backlog finished at $(date +%H:%M:%S)" >> $log
    exit 0
  fi
  echo "down at $(date +%H:%M:%S) (got: '$out')" >> $log
  sleep 180
done
