#!/bin/bash
# Probe TPU health every 8 min; exit 0 the moment a tiny matmul completes.
# Writes a timestamped log so the round can see the wedge/recovery timeline.
LOG=/root/repo/tpu_watch.log
PROBE='import jax.numpy as jnp, numpy as np, sys; x = jnp.ones((128,128)); print("ALIVE", float(np.asarray(x @ x)[0,0])); sys.stdout.flush()'
for i in $(seq 1 60); do
  ts=$(date +%H:%M:%S)
  out=$(timeout 100 python -c "$PROBE" 2>&1 | tail -1)
  if echo "$out" | grep -q ALIVE; then
    echo "$ts probe $i: ALIVE" >> "$LOG"
    exit 0
  fi
  echo "$ts probe $i: wedged ($out)" >> "$LOG"
  sleep 480
done
echo "never recovered" >> "$LOG"
exit 1
