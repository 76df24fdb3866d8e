#!/bin/bash
# Serialize TPU experiments: run each script once the previous one exits.
# Usage: nohup experiments/queue_runner.sh script1.py script2.py ... &
cd /root/repo
for s in "$@"; do
  while pgrep -f "python experiments/prof" > /dev/null; do sleep 15; done
  echo "[queue] starting $s at $(date)" >> /tmp/queue.log
  PYTHONPATH=/root/repo:/root/.axon_site python "experiments/$s" \
    > "/tmp/${s%.py}.log" 2>&1
  echo "[queue] finished $s at $(date)" >> /tmp/queue.log
done
