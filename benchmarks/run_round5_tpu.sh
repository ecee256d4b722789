#!/bin/bash
# Round-5 TPU measurement queue — strictly serialized (one JAX client on the
# axon tunnel at a time; see benchmarks/README.md infra notes).
# Usage: bash benchmarks/run_round5_tpu.sh [stage...]   (default: all)
# Logs: benchmarks/logs/r5_<stage>.log
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs

run() {
  local name="$1"; shift
  local log="benchmarks/logs/r5_${name}.log"
  echo "=== [$(date +%H:%M:%S)] $name -> $log"
  timeout "${STAGE_TIMEOUT:-7200}" "$@" >"$log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] $name done rc=$rc"
  tail -3 "$log" | sed 's/^/    /'
}

stages="${*:-ablate sw_matched scaling_linear scaling_as scaling_sw adaptive bench}"

for s in $stages; do
  case "$s" in
    ablate)        run ablate python -u benchmarks/bench_linear_ablate_inloop.py 32768 100 ;;
    sw_matched)    STAGE_TIMEOUT=10800 run sw_matched env SW_SAMPLE=matched python -u examples/estimate_sw_real.py ;;
    scaling_linear) run scaling_linear python -u benchmarks/bench_scaling_n.py linear ;;
    scaling_as)    run scaling_as env AS_BACKEND=pallas python -u benchmarks/bench_scaling_n.py as ;;
    scaling_sw)    run scaling_sw python -u benchmarks/bench_scaling_n.py sw ;;
    adaptive)      run adaptive python -u benchmarks/bench_as_adaptive.py ;;
    as_2obs)       run as_2obs python -u benchmarks/bench_as_2obs.py ;;
    bench)         run bench python -u bench.py ;;
    pallas)        run pallas python -u benchmarks/bench_as_pallas.py 16384 ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== queue complete"
