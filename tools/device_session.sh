#!/bin/bash
# Probe-first device session: wait for the tunnel, then run the batch.
cd /root/repo
exec > /tmp/device_session.log 2>&1
set -x
for attempt in $(seq 1 120); do
  date
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel alive (attempt $attempt)"
    break
  fi
  echo "tunnel dead (attempt $attempt); sleeping 180s"
  sleep 180
done
echo "=== vprims ==="
timeout 900 python tools/tpu_kernel_lab.py vprims
echo "=== vcopy decode prototype (the ~2x lever) ==="
timeout 900 python tools/tpu_kernel_lab.py vcopy
echo "=== bench_kernels baseline ==="
timeout 900 python tools/bench_kernels.py enc mid dec
echo "=== decode small-g2 A/B (8 = pre-round-3 default) ==="
PLZ4_DEC_SMALLG2=8 timeout 700 python tools/bench_kernels.py dec
echo "=== mid depth4 A/B ==="
PLZ4_MID_DEPTH4=1 timeout 700 python tools/bench_kernels.py mid
echo "=== encode hashtab A/B at 32KB blocks ==="
PLZ4_BENCH_BLOCK=32768 timeout 700 python tools/bench_kernels.py enc
PLZ4_BENCH_BLOCK=32768 PLZ4_ENC_HASHTAB=1 timeout 700 python tools/bench_kernels.py enc
echo "=== done ==="
date
