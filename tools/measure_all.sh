#!/bin/bash
# One-shot on-chip measurement sweep (run when the TPU tunnel is up).
# Each lane appends to /tmp/measure_all_r4.jsonl so a mid-sweep tunnel
# drop keeps earlier results.
set -u
OUT=${1:-/tmp/measure_all_r4.jsonl}
cd "$(dirname "$0")/.."

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

run bench_3d_ref5 python bench.py                 # structured hypercube (BENCH lane)
run bench_turek python bench.py --turek           # prism path on the real Turek 3D mesh
run bench_turek2d python bench.py --turek2d       # patch2d path on the Turek 2D mesh
run bench_sphere python bench.py --sphere         # patch3d path on the Gmsh sphere mesh
run layout python tools/bench_layout.py           # (N,4) vs flat elementwise/dots
T=1800 run step_ref1 python bench_step.py 1 3
T=1800 run step_ref2 python bench_step.py 2 3
T=2400 run step_ref3 python bench_step.py 3 2
echo "done -> $OUT" >&2
