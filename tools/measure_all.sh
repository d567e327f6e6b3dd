#!/bin/bash
# One-shot on-chip measurement sweep (run when the TPU tunnel is up).
# Each lane appends to validation/measure_all_r5.jsonl (COMMITTED, not
# /tmp — the round-4 process bug) so a mid-sweep tunnel drop keeps
# earlier results.  Fast + decision-gating lanes run first.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-validation/measure_all_r5.jsonl}

run() {
  name=$1; shift
  echo "=== $name: $*" >&2
  timeout "${T:-900}" "$@" > /tmp/measure_out.log 2>/tmp/measure_err.log
  rc=$?
  line=$(tail -1 /tmp/measure_out.log)
  # accept only a real result: rc 0 AND a JSON object on the last line
  if [ $rc -eq 0 ] && [ "${line:0:1}" = "{" ]; then
    echo "{\"lane\": \"$name\", \"result\": $line}" >> "$OUT"
    echo "$line" >&2
  else
    echo "{\"lane\": \"$name\", \"error\": $rc}" >> "$OUT"
    tail -3 /tmp/measure_err.log >&2
  fi
}

# --- fast operator lanes (minutes each) -------------------------------
run bench_3d_ref5 python bench.py                 # structured hypercube (BENCH lane)
# qz/qy sublane-stacked q-point physics A/B (round 4; PERF.md)
NS_QZ_STACK=1 run bench_3d_ref5_qzstack python bench.py
run bench_turek python bench.py --turek           # prism path on the real Turek 3D mesh
NS_QZ_STACK=1 run bench_turek_qzstack python bench.py --turek
run bench_turek2d python bench.py --turek2d       # patch2d path on the Turek 2D mesh
run bench_sphere python bench.py --sphere         # patch3d path on the Gmsh sphere mesh
run layout python tools/bench_layout.py           # (N,4) vs flat elementwise/dots
# --- decision gates ----------------------------------------------------
# reference-grade tolerances on chip (VERDICT r3 #3 / r4 #3): Newton abs
# 1e-7 vs the stored CPU-f64 baseline — gates the default-tolerance flip
T=1800 run tolerance_proof python tools/tolerance_proof.py
# --- s/step lanes -------------------------------------------------------
T=1800 run step_ref1 python bench_step.py 1 3
T=1800 run step_ref2 python bench_step.py 2 3
T=2400 run step_ref3 python bench_step.py 3 2
# omega-reuse A/B: skip the 20-it power method on 3 of 4 rebuilds
T=1800 NS_OMEGA_REFRESH=4 run step_ref2_omega4 python bench_step.py 2 3
T=1800 NS_STEP_TOL=1e-7 run step_ref1_tol7 python bench_step.py 1 3
# --- physics re-certification (long) -----------------------------------
# on-chip corridor with the patch2d operator post-dispatch-fusion
T=7200 run corridor_tpu python tools/corridor_tpu.py
echo "done -> $OUT" >&2
