#!/bin/bash
# Run the full TPU-leg validation + measurement queue, sequentially.
# Launch with: nohup /tmp/tpu_work_queue.sh > /tmp/tpu_queue.log 2>&1 &
set -x
cd /root/repo
date
# 1. health probe
timeout 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices(), float(jnp.arange(64.0).sum()))" || exit 1
# 2. TPU-leg test suite (~20 min)
CBLOSC_TPU_TEST_PLATFORM=axon timeout 2400 python -m pytest tests/ -q \
  > /tmp/tpu_suite_r2.log 2>&1
tail -2 /tmp/tpu_suite_r2.log
# 3. bench (quick first, then default)
timeout 900 python bench.py --workingset 67108864 --iters 3 \
  > /tmp/bench_quick_r2.log 2>&1
tail -4 /tmp/bench_quick_r2.log
# 4. profilers
timeout 1800 python scratch/r2_profile_decode.py > /tmp/prof_dec.log 2>&1
timeout 1200 python scratch/r2_profile_clevel9.py > /tmp/prof_cl9.log 2>&1
timeout 900 python scratch/r2_probe_expand_512k.py > /tmp/probe_512k.log 2>&1
date
echo QUEUE_DONE
