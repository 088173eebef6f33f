#!/bin/bash
# Phase-2 TPU campaign: wait for recovery, then measure the headline paths
# with PATIENT windows (killing an in-flight tunnel compile wedges the
# queue for tens of minutes — see docs/SESSION_NOTES.md round-3 notes).
LOG=/root/repo/tpu_campaign.log
cd /root/repo
PROBE='import jax.numpy as jnp, numpy as np, sys, time; s=(time.time_ns()%97)+1.0; x = jnp.full((128,128), s/128.0); print("ALIVE" if abs(float(np.asarray(x @ x)[0,0])-s*s/128.0)<1e-3 else "BAD"); sys.stdout.flush()'

probe () {
  out=$(timeout 100 python -c "$PROBE" 2>&1 | tail -1)
  echo "$(date +%H:%M:%S) probe[$1]: $out" >> "$LOG"
  echo "$out" | grep -q ALIVE
}

# wait up to ~4h for recovery
for i in $(seq 1 30); do
  if probe "wait$i"; then break; fi
  sleep 480
done
probe final_wait || { echo "$(date +%H:%M:%S) never recovered" >> "$LOG"; exit 1; }

echo "$(date +%H:%M:%S) === fast512 (patient, no kill) ===" >> "$LOG"
timeout 1800 python -u bench_inner.py --fast >> "$LOG" 2>&1
probe after_fast512

echo "$(date +%H:%M:%S) === volume512 ===" >> "$LOG"
timeout 1500 python -u bench_inner.py --volume >> "$LOG" 2>&1
probe after_volume

echo "$(date +%H:%M:%S) === soak 30 fast frames ===" >> "$LOG"
timeout 1500 python -u - >> "$LOG" 2>&1 <<'EOF'
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
from bench_inner import _bunny, WIDTH, HEIGHT
from gravit_tpu.accel.scene_accel import build_scene_bvh
from gravit_tpu.render.tracer import trace_image_fast
cm, scene, cam = _bunny()
accel = build_scene_bvh([cm])
rays0 = cam.generate_rays()
times = []
for i in range(30):
    t0 = time.time()
    rays = rays0.replace(origin=rays0.origin + 1.9e-6 * (i + 1))
    fb = trace_image_fast(scene, rays, WIDTH, HEIGHT, accel=accel)
    float(np.asarray(fb[:8, :]).sum())
    times.append(time.time() - t0)
print(json.dumps({"soak_frames": len(times),
                  "ms_min": round(min(times)*1e3, 1),
                  "ms_med": round(sorted(times)[len(times)//2]*1e3, 1),
                  "ms_max": round(max(times)*1e3, 1)}))
EOF
probe after_soak
echo "$(date +%H:%M:%S) campaign2 done" >> "$LOG"
