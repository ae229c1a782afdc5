#!/usr/bin/env bash
# Big-N benchmark pipeline — the analog of the reference's benchmark.sh
# (/root/reference/benches/benchmark.sh): sweeps sizes 2^LO..2^HI, budgets
# iterations by an N*log2(N) cost model, randomizes library order per size,
# and writes seconds-per-iter sample files under
# benchmark-data.<timestamp>/<library>/size_n.
#
# Usage: ./benchmark.sh <lo_log2> <hi_log2>
# Env:   PRECISION=f64|f32   BUDGET_NS (per-size time budget, default 2e9)
#        LIBS="phastft numpy scipy"

set -euo pipefail

LO="${1:?usage: ./benchmark.sh lo_log2 hi_log2}"
HI="${2:?usage: ./benchmark.sh lo_log2 hi_log2}"
PRECISION="${PRECISION:-f64}"
BUDGET_NS="${BUDGET_NS:-2000000000}"
LIBS="${LIBS:-phastft numpy scipy}"

STAMP="$(date +%s)"
OUT="benchmark-data.${STAMP}"
mkdir -p "${OUT}"
ROOT="$(cd "$(dirname "$0")" && pwd)"

for (( LG=LO; LG<=HI; LG++ )); do
  N=$((1 << LG))
  # iteration budget from the N*log2(N) cost model
  # (reference benches/benchmark.sh:53-59)
  ITERS=$(python - "$N" "$LG" "$BUDGET_NS" <<'PY'
import sys
n, lg, budget = int(sys.argv[1]), int(sys.argv[2]), float(sys.argv[3])
overhead_ns = 2e7
cost = overhead_ns + 0.25 * n * lg
print(max(3, min(1000, int(budget / cost))))
PY
)
  # randomize library order per size (awk shuffle in the reference)
  ORDER=$(printf '%s\n' ${LIBS} | python -c \
    "import sys,random; ls=sys.stdin.read().split(); random.shuffle(ls); print(' '.join(ls))")
  for LIB in ${ORDER}; do
    mkdir -p "${OUT}/${LIB}"
    python "${ROOT}/benches/timing_runner.py" \
      --lib "${LIB}" --n "${N}" --iters "${ITERS}" \
      --precision "${PRECISION}" \
      > "${OUT}/${LIB}/size_${N}" || echo "FAIL ${LIB} ${N}" >&2
  done
  echo "n=2^${LG} iters=${ITERS} done"
done
echo "wrote ${OUT}/"
