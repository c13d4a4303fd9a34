#!/usr/bin/env bash
# Big-scene perf matrix for the shortlist-sweep work (run on the real chip).
# Writes one log per config to outputs/perf_r2/. Usage:
#   bash scripts/r2_perf_matrix.sh            # full matrix
#   ONLY=base bash scripts/r2_perf_matrix.sh  # just the HEAD defaults
set -u
cd "$(dirname "$0")/.."
OUT=outputs/perf_r2
mkdir -p "$OUT"

run() {  # run <tag> <extra-env...>
    local tag=$1; shift
    echo "=== $tag ($(date +%H:%M:%S)) ==="
    for scene in knot290k.xml ite-orb.xml; do
        log="$OUT/${tag}-${scene%.xml}.log"
        env "$@" RENDER=1 SCENE=$scene timeout 2400 \
            python scripts/bench_cluster.py >"$log" 2>&1
        tail -1 "$log"
    done
    # micro (closest/any on primary+bounce rays), knot only
    log="$OUT/${tag}-micro.log"
    env "$@" timeout 1200 python scripts/bench_cluster.py >"$log" 2>&1
    tail -2 "$log"
}

case "${ONLY:-all}" in
  base) run base ;;
  all)
    run base                                  # two-phase on (default)
    run single ADAPT_TWO_PHASE=0              # single-pass sweep
    run ph1c2  ADAPT_PH1_CAP=2
    run ph1c8  ADAPT_PH1_CAP=8
    run ebe512 ADAPT_EB_E=512                 # early exit ~off
    ;;
  *) run "$ONLY" ;;
esac
echo "done -> $OUT"
