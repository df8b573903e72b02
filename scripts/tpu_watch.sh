#!/bin/bash
# Keep probing the TPU tunnel; when it comes alive, run bench.py and store
# the result. Used during development rounds where the axon tunnel is flaky.
cd /root/repo
for i in $(seq 1 60); do
  echo "[tpu_watch] probe $i at $(date +%H:%M:%S)" >> /tmp/tpu_watch.log
  if timeout 240 python -c "import jax; jax.devices()" >> /tmp/tpu_watch.log 2>&1; then
    echo "[tpu_watch] TPU ALIVE at $(date +%H:%M:%S); running bench" >> /tmp/tpu_watch.log
    timeout 3000 python bench.py > /tmp/bench_r4_live.json 2>> /tmp/tpu_watch.log
    echo "[tpu_watch] bench rc=$? output:" >> /tmp/tpu_watch.log
    cat /tmp/bench_r4_live.json >> /tmp/tpu_watch.log
    exit 0
  fi
  sleep 300
done
echo "[tpu_watch] gave up after 60 probes" >> /tmp/tpu_watch.log
exit 1
