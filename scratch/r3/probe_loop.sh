#!/bin/bash
# One probe at a time; wait for each to finish fully before the next.
for i in $(seq 1 40); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> /root/repo/scratch/r3/probe_loop.log
  python /root/repo/scratch/r3/health.py >> /root/repo/scratch/r3/probe_loop.log 2>&1
  if [ $? -eq 0 ]; then
    echo "TPU_UP at $(date -u +%H:%M:%S)" >> /root/repo/scratch/r3/probe_loop.log
    exit 0
  fi
  sleep 600
done
