#!/bin/bash
# Chip-work queue: wait for the PID in $1 (an in-flight chip job) to exit,
# then run the queued hardware experiments back-to-back and commit ONLY the
# artifacts of experiments that exited cleanly (a timed-out run must not
# sweep stale/partial JSONs — or anything another session staged — into a
# "Record hardware artifacts" commit). Survives session boundaries (nohup).
cd /root/repo || exit 1
PID="${1:?usage: chip_queue.sh <pid-to-wait-for>}"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
sleep 15

declare -a COMMIT_PATHS=()
run_exp() { # run_exp <timeout_s> <artifact_path...> -- <cmd...>
  local t="$1"; shift
  local arts=()
  while [ "$1" != "--" ]; do arts+=("$1"); shift; done
  shift
  echo "=== $* ($(date -u))"
  if timeout "$t" "$@"; then
    COMMIT_PATHS+=("${arts[@]}")
  else
    echo "=== FAILED/TIMED OUT (rc=$?): $* — artifacts NOT queued for commit"
  fi
}

{
  echo "=== chip job $PID exited; starting chip queue $(date -u)"
  run_exp 3000 experiments/PROVE_L1.json -- python experiments/prove_l1.py 1
  run_exp 1800 experiments/MERKLE_SCALE.json -- python experiments/merkle_scale.py 20
  run_exp 2400 experiments/PRIMITIVES.json -- python experiments/primitives.py
  run_exp 2400 experiments/MSM_AB.json -- python experiments/msm_ab.py 17
  echo "=== chip queue done $(date -u)"
  if [ "${#COMMIT_PATHS[@]}" -gt 0 ]; then
    git add -- "${COMMIT_PATHS[@]}" && \
      git commit -m "Record hardware lab artifacts" -- "${COMMIT_PATHS[@]}"
  fi
} >> /root/repo/tmp_chipqueue.log 2>&1
