#!/bin/bash
# One-command chip session: run everything that needs the real TPU, in
# priority order, logging to /tmp/chip_session/.  Safe to re-run; each
# step has its own timeout so a wedged tunnel can't eat the whole window.
#
#   1. profile_chain.py  — fetch-chunk sweep, enqueue-thread A/B,
#                          optional sub-batch sweep, device trace,
#                          host marks       (~20-60 min incl. compiles)
#   2. bench.py          — the headline number + bit-exactness gates
#
# Usage: tools/chip_session.sh [SUBBATCH_LIST]
set -u
out=/tmp/chip_session
mkdir -p "$out"
ts() { date +%H:%M:%S; }

echo "$(ts) chip session start" | tee -a "$out/log"

echo "$(ts) step 1: profile_chain (sweeps + trace)" | tee -a "$out/log"
OMM_PROF_SUBBATCH="${1:-128}" timeout -k 60 4200 \
  python tools/profile_chain.py > "$out/profile_chain.txt" 2>&1
echo "$(ts) profile_chain rc=$? (see $out/profile_chain.txt)" \
  | tee -a "$out/log"

echo "$(ts) step 2: bench" | tee -a "$out/log"
timeout -k 60 4200 python bench.py > "$out/bench.json" 2> "$out/bench.err"
echo "$(ts) bench rc=$? (see $out/bench.json)" | tee -a "$out/log"
tail -1 "$out/bench.json" | tee -a "$out/log"
echo "$(ts) chip session done" | tee -a "$out/log"
