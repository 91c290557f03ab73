#!/usr/bin/env bash
# Run the measured baseline: reference `mods` binary, full CVIU escalation
# ladder on the bundled cat pair (reference README.md:60-67). Emits per-run
# wall time from the reference's own time.log (io_mods.cpp:69-102) and the
# quality log (io_mods.cpp:10-68).
#
# Measured on this machine 2026-08-20 (5 runs, all cores):
#   Total s/pair: 2.14 2.36 2.60 2.52 2.47  -> median 2.47 s (0.405 pairs/s)
#   Quality: 20 true matches / 52 tentatives, 38.5% inlier ratio, 5 steps.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
RB="$REPO/.refbuild"
[ -x "$RB/b/mods" ] || "$REPO/scripts/build_reference.sh"
RUN="$RB/run"
mkdir -p "$RUN"
cd "$RUN"
cp -f "$RB/src/build/examples/cat.png" "$RB/src/build/examples/cat2.png" .
cp -f "$RB/src/build/examples/cat.txt" gt_h.txt 2>/dev/null || true
cp -f "$RB/src/build/config_iter_mods_cviu.ini" "$RB/src/build/iters_mods_cviu.ini" .
N="${1:-5}"
for i in $(seq 1 "$N"); do
  "$RB/b/mods" cat.png cat2.png o1.png o2.png k1.txt k2.txt matchings.txt \
    log.txt 0 0 gt_h.txt config_iter_mods_cviu.ini iters_mods_cviu.ini \
    > "run_$i.out" 2>&1 || true
  echo "run $i: $(tail -1 time.log)"
done
echo "log.txt: $(cat log.txt)"
