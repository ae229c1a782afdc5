#!/bin/bash
# Round-3 device session — run phases in order, ONE process at a time,
# each under nohup with no timeout (axon discipline). Poll the logs.
# Phase gating is manual: run each block once the previous completes.
set -u
cd /root/repo
R3=/root/repo/scratch/r3

phase_race() {
  nohup python $R3/race_f32.py > $R3/race.log 2>&1 &
  echo "race pid $!"
}

# After race: flip DEFAULT_LEAF_KERNEL / DEFAULT_COL_ENGINE constants,
# commit, then sweeps.

phase_sweep_main() {  # all groups to 2^24, 3 samples per point
  nohup python benches/bench_phastft.py --max-log 24 \
    > $R3/sweep_main.log 2>&1 &
  echo "sweep pid $!"
}

phase_sweep_ceiling() {  # c2c ceiling sizes
  nohup python benches/bench_phastft.py \
    --groups c2c_f32_forward,c2c_f64_forward --min-log 25 --max-log 26 \
    > $R3/sweep_ceiling.log 2>&1 &
  echo "ceiling pid $!"
}

phase_sweep_f32_28() {
  nohup python benches/bench_phastft.py \
    --groups c2c_f32_forward --min-log 27 --max-log 28 \
    > $R3/sweep_28.log 2>&1 &
  echo "28 pid $!"
}

phase_planner_mode() {
  nohup python benches/bench_planner_mode.py --min-log 8 --max-log 18 \
    > $R3/planner_mode.log 2>&1 &
  echo "planner-mode pid $!"
}

phase_profile() {
  nohup ./profile.sh 24 f32 > $R3/profile.log 2>&1 &
  echo "profile pid $!"
}

phase_bench_headline() {
  nohup python bench.py > $R3/bench_headline.log 2>&1 &
  echo "bench pid $!"
}

"$@"
