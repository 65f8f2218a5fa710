#!/usr/bin/env bash
# Condense an onchip_sweep.sh log into the lines the docs need:
# release_check claim results, bench JSON, roofline rows, MXU verdicts,
# suite ladder, large-dim scan timings, and any step failures.
#
# Usage: bash benchmarks/sweep_summary.sh /tmp/onchip_sweep_auto.log

set -u
LOG="${1:?usage: sweep_summary.sh <sweep log>}"

echo "=== step boundaries + exit codes"
grep -E '^=== \[' "$LOG"

echo
echo "=== release_check claims"
grep -E 'PASS|FAIL' "$LOG" | grep -vE '^=== '

echo
echo "=== bench JSON line(s)"
grep -E '^\{"metric"' "$LOG"

echo
echo "=== roofline rows (%HBM / %VPU)"
grep -iE 'HBM|VPU|roofline|ms/iter' "$LOG" | head -60

echo
echo "=== MXU probe verdicts"
grep -iE 'verdict|keep|reject|x over|speedup' "$LOG" | head -40

echo
echo "=== suite ladder"
grep -iE 'solves/s|config[0-9]|ladder' "$LOG" | head -40

echo
echo "=== errors / tracebacks"
grep -nE 'Traceback|Error|error:' "$LOG" | head -20
