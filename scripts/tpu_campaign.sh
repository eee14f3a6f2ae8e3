#!/bin/bash
# TPU measurement campaign for the round-3 serving stack. Run on the
# machine with the real chip; each phase appends one JSON line to
# $OUT (default /tmp/tpu_campaign.jsonl). Warm-resumes from .bench_warm.
#
#   bash scripts/tpu_campaign.sh [phase ...]
#
# Phases (default: all, in this order):
#   default     bench at defaults (mixed-(W,N) fleet, solve auto, B=2048)
#   uniform     the uniform W=30/N=40 fleet (deepest-floor fleet)
#   lu          ROMTIME_SOLVE_ITERS=0 (blocked-LU kernel) comparison
#   b4096       batch 4096 at the joint point
#   autotune    measured matrices-vs-theta at headline scale
#   throughput  the small-N global-basis profile
#   device      COLD build with BENCH_OFFLINE=device (offline wall on
#               chip; the sweep pins full-precision matmuls — verify
#               rel_l2_vs_fom <= 1e-6 in the emitted line before
#               trusting a device-built fleet)
set -u
cd "$(dirname "$0")/.."
OUT="${OUT:-/tmp/tpu_campaign.jsonl}"
phases=("$@")
[ $# -eq 0 ] && phases=(default lu b4096 autotune throughput)

run() {
  local name="$1"; shift
  echo "=== phase: $name ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(env "$@" timeout 3000 python bench.py 2>/tmp/bench_${name}.log \
         | tail -1)
  if [ -n "$line" ]; then
    echo "{\"phase\": \"$name\", \"bench\": $line}" >> "$OUT"
    echo "$line" | head -c 400 >&2; echo >&2
  else
    echo "{\"phase\": \"$name\", \"bench\": null}" >> "$OUT"
    echo "phase $name FAILED — see /tmp/bench_${name}.log" >&2
  fi
}

for p in ${phases[@]}; do
  case "$p" in
    default)    run default ;;
    uniform)    run uniform BENCH_CELL_WN="30x40,30x40,30x40,30x40" \
                    BENCH_WINDOWS=30 BENCH_WINDOW_N=40 \
                    BENCH_DIR=.bench_uniform_f64 ;;
    lu)         run lu ROMTIME_SOLVE_ITERS=0 ;;
    b4096)      run b4096 BENCH_ONLINE_MU=4096 ;;
    autotune)   run autotune BENCH_AUTOTUNE=1 ;;
    throughput) run throughput BENCH_PROFILE=throughput BENCH_DIR=tmp ;;
    device)     run device BENCH_OFFLINE=device BENCH_COLD=1 \
                    BENCH_DIR=.bench_device ;;
    *) echo "unknown phase $p" >&2 ;;
  esac
done
echo "campaign done -> $OUT" >&2
