#!/bin/bash
# Chip-work queue: wait for the PID in $1 (the in-flight recursive run) to
# exit, then run the queued hardware experiments back-to-back and commit
# their artifacts. Survives session boundaries (nohup).
cd /root/repo || exit 1
PID="${1:?usage: chip_queue.sh <pid-to-wait-for>}"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
sleep 15
{
  echo "=== recursive run exited; starting chip queue $(date -u)"
  echo "=== msm_ab"
  timeout 3000 python experiments/msm_ab.py 17 20
  echo "=== hw_check stage8"
  timeout 1800 python experiments/hw_check.py 8
  echo "=== merkle_scale 2^20"
  timeout 1800 python experiments/merkle_scale.py 20
  echo "=== primitives"
  timeout 2400 python experiments/primitives.py
  echo "=== chip queue done $(date -u)"
} >> /root/repo/tmp_chipqueue.log 2>&1
git add experiments/MSM_AB.json experiments/MERKLE_SCALE.json \
        experiments/PRIMITIVES.json build/recursive_run/RECURSIVE_RUN.json \
        build/recursive_run/1_sigs_1_batches_5_height 2>/dev/null
git commit -m "Record hardware artifacts: MSM A/B sweep, Merkle/primitives labs, recursive run" 2>/dev/null
