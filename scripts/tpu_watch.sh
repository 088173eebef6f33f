#!/bin/bash
# Probe TPU health every 8 min; exit 0 the moment a tiny matmul completes.
# Writes a timestamped log so the round can see the wedge/recovery timeline.
LOG=/root/repo/tpu_watch.log
# time-salted so the axon memoization cache cannot fake an ALIVE
PROBE='import jax.numpy as jnp, numpy as np, sys, time; s=(time.time_ns()%97)+1.0; x = jnp.full((128,128), s/128.0); print("ALIVE" if abs(float(np.asarray(x @ x)[0,0])-s*s/128.0)<1e-3 else "BAD"); sys.stdout.flush()'
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
