#!/bin/bash
cd /root/repo || exit 1
PID="${1:?usage}"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
sleep 15
{
  echo "=== queue part 3 start $(date -u)"
  timeout 2400 bash -c 'python experiments/hw_check.py 10 2>&1 | tee experiments/HW_CHECK10.log'
  timeout 5400 bash -c 'ZKPOA_TEST_TPU=1 ZKPOA_HEAVY_TESTS=1 python -m pytest tests/test_workflow.py -k full_mode -m slow -x -q 2>&1 | tee experiments/HEAVY_FULL.log'
  echo "=== queue part 3 done $(date -u)"
} >> /root/repo/tmp_chipqueue4.log 2>&1
