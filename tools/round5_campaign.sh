#!/bin/bash
# Round-5 TPU campaign queue — serialized (one process owns the chip at a
# time). Results land in results/round5_campaign.log; per-seed JSON lines
# stream as they finish. Stages:
#   1. 10-seed planck-like coverage campaign (err_total incl. dlogz_hyp —
#      VERDICT r4 item 5 'Done' = coverage 10/10)
#   2. CamSpec-like d=15 to completion, seed 3 plain + seed 7 with input
#      warping (VERDICT items 2 and 3's warp-validation axis)
set -u
cd /root/repo
# examples import bobe_tpu from the repo root; `python examples/x.py`
# puts examples/ (not the root) on sys.path — APPEND to keep the axon hook
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
mkdir -p results
LOG=results/round5_campaign.log
{
  echo "=== campaign start $(date) loadavg $(cut -d' ' -f1-3 /proc/loadavg) ==="
  echo "--- stage 1: planck 10-seed coverage ---"
  timeout 7200 python tools/multiseed_eval.py planck --seeds=3,4,5,7,11,13,17,19,23,42
  echo "--- stage 2a: camspec d=15 seed 3 (plain) --- $(date)"
  timeout 7200 python examples/camspec_like_15d.py seed=3
  echo "--- stage 2b: camspec d=15 seed 7 (input warp) --- $(date)"
  BOBE_TPU_EX_WARP=1 timeout 7200 python examples/camspec_like_15d.py seed=7
  echo "=== campaign end $(date) ==="
} >> "$LOG" 2>&1
