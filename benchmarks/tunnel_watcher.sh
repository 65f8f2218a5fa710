#!/usr/bin/env bash
# Detached watcher: poll the axon tunnel relay until it comes back, then run
# the full on-chip measurement sweep. Written for the 2026-08-17 outage
# (>10 h); safe to leave running — it exits after one COMPLETED sweep or at
# the deadline, retries if the relay flaps before the sweep could start, and
# refuses to start a second copy while another watcher is alive.
#
# Usage: nohup bash benchmarks/tunnel_watcher.sh >/tmp/tunnel_watcher.log 2>&1 &

set -u
cd "$(dirname "$0")/.."

LOCK=/tmp/tfmpc_tunnel_watcher.lock
if mkdir "$LOCK" 2>/dev/null; then
    echo $$ > "$LOCK/pid"
else
    # A stale lock (killed watcher, reboot) must not disable the watcher
    # forever: take over unless the recorded owner is still alive.
    owner=$(cat "$LOCK/pid" 2>/dev/null || echo "")
    if [ -n "$owner" ] && kill -0 "$owner" 2>/dev/null; then
        echo "watcher already running (pid $owner) — exiting"
        exit 0
    fi
    echo "stale lock (owner ${owner:-unknown} dead) — taking over"
    echo $$ > "$LOCK/pid"
fi
# Separate signal traps: a handler without `exit` resumes the loop after
# the current command, so a plain TERM previously left a lockless zombie
# watcher running (observed 2026-08-19) — the EXIT trap does the cleanup.
trap 'rm -rf "$LOCK" 2>/dev/null' EXIT
trap 'exit 143' INT TERM

health() {
    curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8103/health
}

# The relay can be up at the HTTP level while on-chip compute hangs
# (observed 2026-08-20: /health answered 404 for hours while an 8x8 matmul
# never returned). Health for sweep purposes = a real computation
# round-trips; otherwise every sweep step would burn its full timeout.
compute_ok() {
    PYTHONPATH=/root/.axon_site:/root/repo timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8))
assert float(jnp.sum(x @ x)) == 512.0
" >/dev/null 2>&1
}

DEADLINE=$(( $(date +%s) + 10*3600 ))   # give up after 10 h
echo "watcher started $(date -u) (pid $$); polling every 60 s for up to 10 h"

while :; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
        echo "deadline reached $(date -u) — tunnel never stayed up; exiting"
        exit 1
    fi

    code=$(health)
    if [ "$code" = "000" ]; then
        sleep 60
        continue
    fi
    if ! compute_ok; then
        echo "relay answers (health=$code) but compute hangs at $(date -u) — re-polling"
        sleep 120
        continue
    fi
    echo "tunnel up (health=$code, compute probe ok) at $(date -u)"

    # Never share the compile cache with a concurrently-running pytest
    # process (CLAUDE.md); wait, don't kill.
    while pgrep -f "pytest" >/dev/null 2>&1; do
        echo "pytest running — waiting 30 s before starting the sweep"
        sleep 30
    done

    # The relay may have flapped while waiting (30 min-3 h windows observed)
    # — re-check instead of burning the attempt on an immediate abort.
    if [ "$(health)" = "000" ]; then
        echo "tunnel dropped again before the sweep could start — re-polling"
        continue
    fi

    echo "starting onchip sweep $(date -u)"
    bash benchmarks/onchip_sweep.sh /tmp/onchip_sweep_auto.log
    rc=$?
    # rc=0: all steps passed. rc=1: the sweep COMPLETED but some steps
    # failed — the measurements that exist are in the log; re-running the
    # whole sweep would loop failing steps for hours, so stop and let a
    # human read the FAIL summary. Only rc=2 (aborted before any step:
    # relay flapped) warrants re-polling.
    if [ "$rc" -ne 2 ]; then
        echo "sweep finished rc=$rc $(date -u) (log: /tmp/onchip_sweep_auto.log)"
        exit "$rc"
    fi
    echo "sweep aborted before start (rc=$rc) at $(date -u) — re-polling"
done
