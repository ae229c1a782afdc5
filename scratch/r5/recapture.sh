#!/usr/bin/env bash
# Round-5 series recapture: the committed device series must reflect the
# CURRENT engine defaults (round-4 verdict item 4). Forward groups over
# the flagged windows + first evidence at 2^28 (f32 nested plan, f64
# native fallback).
set -x
cd /root/repo
python benches/bench_phastft.py --groups c2c_f64_forward --min-log 20 --max-log 28
python benches/bench_phastft.py --groups c2c_f32_forward --min-log 24 --max-log 28
python benches/bench_phastft.py --groups r2c_f64_forward --min-log 20 --max-log 26
python benches/bench_phastft.py --groups c2r_f64_inverse --min-log 20 --max-log 24
python benches/bench_phastft.py --groups c2c_f64_inverse,c2c_f32_inverse --min-log 24 --max-log 24
