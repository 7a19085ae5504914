#!/bin/bash
# Cold-start measurement with the persistent device server (VERDICT r4 #1).
#
# Legs (all on the relay-attached TPU, run serially):
#   A. control: banana quickstart in a FRESH process, no server — pays the
#      per-process executable-load wall (round-4 measurement: 377 s cold
#      vs 27.7 s warm in-process).
#   B. server boot with --prewarm-d 2 (the quickstart's dimension): the
#      one-time cost a deployment pays.
#   C. quickstart via BOBE_TPU_SERVER from a fresh client process — the
#      per-run cost every user process pays from then on.
#   D. leg C again (a second fresh client) — confirms stability.
#
# Acceptance (VERDICT): per-user-process cold start <= 3x the in-process
# warm floor (27.7 s) => legs C/D <= ~83 s.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
SOCK=/tmp/bobe5_measure.sock
LOG=results/coldstart_measure.log
{
  echo "=== cold-start measurement $(date) loadavg $(cut -d' ' -f1-3 /proc/loadavg) ==="
  echo "--- leg A: fresh-process quickstart, no server ---"
  /usr/bin/time -v python examples/banana.py 2>&1 | grep -E "wall time|Final logZ|Elapsed"
  echo "--- leg B: server boot (--prewarm-d 2) ---"
  B0=$(date +%s)
  BOBE_TPU_SERVER_ROLE=server python -m bobe_tpu.server --socket $SOCK \
      --prewarm-d 2 --prewarm-max-n 256 --idle-timeout 1800 \
      > results/coldstart_server.log 2>&1 &
  SRV_PID=$!
  until python -c "
import sys; sys.path.insert(0, '/root/repo')
from bobe_tpu import client
sys.exit(0 if client.ping('$SOCK') else 1)" 2>/dev/null; do
    sleep 2
    kill -0 $SRV_PID 2>/dev/null || { echo "server died"; exit 1; }
  done
  echo "server boot+prewarm: $(( $(date +%s) - B0 )) s"
  echo "--- leg C: fresh client via server ---"
  BOBE_TPU_SERVER=$SOCK python examples/banana.py 2>&1 | grep -E "wall time|Final logZ"
  echo "--- leg D: second fresh client via server ---"
  BOBE_TPU_SERVER=$SOCK python examples/banana.py 2>&1 | grep -E "wall time|Final logZ"
  python -c "
import sys; sys.path.insert(0, '/root/repo')
from bobe_tpu import client
print('shutdown:', client.shutdown('$SOCK'))"
  echo "=== done $(date) ==="
} >> "$LOG" 2>&1
