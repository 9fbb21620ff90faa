#!/bin/bash
# Round-5 chip queue, part 2 (msm_ab already recorded): wait for the
# recursive retry to exit, then run the remaining hardware jobs.
cd /root/repo || exit 1
PID="${1:?usage: chip_queue3.sh <pid-to-wait-for>}"
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
  echo "=== chip job $PID exited; starting round-5 chip queue part 2 $(date -u)"
  run_exp 1500 BENCH_preview.json -- bash -c 'python bench.py | tail -1 > BENCH_preview.json'
  run_exp 2400 experiments/HW_CHECK10.log -- bash -c 'python experiments/hw_check.py 10 2>&1 | tee experiments/HW_CHECK10.log'
  run_exp 2400 experiments/MSM_G2_AB.json -- python experiments/msm_g2_ab.py 18
  run_exp 5400 experiments/HEAVY_FULL.log -- bash -c 'ZKPOA_TEST_TPU=1 ZKPOA_HEAVY_TESTS=1 python -m pytest tests/test_workflow.py -k full_mode -m slow -x -q 2>&1 | tee experiments/HEAVY_FULL.log'
  echo "=== chip queue part 2 done $(date -u)"
  if [ "${#COMMIT_PATHS[@]}" -gt 0 ]; then
    git add -- "${COMMIT_PATHS[@]}" 2>/dev/null
    git commit -m "Record round-5 hardware lab artifacts (part 2)" -- "${COMMIT_PATHS[@]}" 2>/dev/null
  fi
} >> /root/repo/tmp_chipqueue3.log 2>&1
