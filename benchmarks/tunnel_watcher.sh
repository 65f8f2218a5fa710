#!/usr/bin/env bash
# Detached watcher: poll the axon tunnel relay until it comes back, then run
# the full on-chip measurement sweep exactly once. Written for the 2026-08-17
# outage (>10 h); safe to leave running — it exits after one sweep or after
# the deadline, and refuses to start a second copy.
#
# Usage: nohup bash benchmarks/tunnel_watcher.sh >/tmp/tunnel_watcher.log 2>&1 &

set -u
cd "$(dirname "$0")/.."

LOCK=/tmp/tfmpc_tunnel_watcher.lock
if ! mkdir "$LOCK" 2>/dev/null; then
    echo "watcher already running ($LOCK exists) — exiting"
    exit 0
fi
trap 'rmdir "$LOCK" 2>/dev/null' EXIT

DEADLINE=$(( $(date +%s) + 10*3600 ))   # give up after 10 h
echo "watcher started $(date -u); polling every 60 s until $(date -u -d @$DEADLINE 2>/dev/null || echo +10h)"

while :; do
    now=$(date +%s)
    if [ "$now" -ge "$DEADLINE" ]; then
        echo "deadline reached $(date -u) — tunnel never returned; exiting"
        exit 1
    fi
    code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8103/health)
    if [ "$code" != "000" ]; then
        echo "tunnel up (health=$code) at $(date -u)"
        break
    fi
    sleep 60
done

# Never share the compile cache with a concurrently-running pytest process
# (CLAUDE.md); wait, don't kill.
while pgrep -f "pytest" >/dev/null 2>&1; do
    echo "pytest running — waiting 30 s before starting the sweep"
    sleep 30
done

echo "starting onchip sweep $(date -u)"
bash benchmarks/onchip_sweep.sh /tmp/onchip_sweep_auto.log
echo "sweep finished $(date -u) (log: /tmp/onchip_sweep_auto.log)"
