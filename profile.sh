#!/usr/bin/env bash
# Profiling harness — analog of the reference's profile.sh (perf + DWARF
# call graphs on examples/profile.rs). On TPU the equivalent evidence is a
# JAX profiler trace (XPlane) capturing device kernels and HLO timings.
#
# Usage: ./profile.sh [log2_n] [dtype]
# Output: /tmp/phastft-profile/<timestamp>/ — open with TensorBoard or
#         xprof ("tensorboard --logdir /tmp/phastft-profile").

set -euo pipefail
LG="${1:-22}"
DT="${2:-f64}"
ROOT="$(cd "$(dirname "$0")" && pwd)"
PYTHONPATH="${ROOT}:${PYTHONPATH:-}" python "${ROOT}/examples/profile_fft.py" \
  --log2-n "${LG}" --dtype "${DT}"
