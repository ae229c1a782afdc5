#!/bin/bash
# Wait for the mxu2:mxu result line, then kill the old race at the safe
# boundary (result just saved, next compile not yet dispatched) and start
# the trimmed continuation.
OLD_PID=$1
while kill -0 "$OLD_PID" 2>/dev/null; do
  if grep -q "f32:2^24:mxu2:mxu .* ms" /root/repo/scratch/r3/race.log; then
    kill "$OLD_PID"
    sleep 2
    break
  fi
  sleep 2
done
cd /root/repo
PYTHONPATH=/root/.axon_site:/root/repo nohup python scratch/r3/race2.py \
  > scratch/r3/race2.log 2>&1 &
echo "race2 pid $!" > scratch/r3/race2.pid
