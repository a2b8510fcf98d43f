#!/usr/bin/env bash
# Pre-commit gate: the minimum proof that HEAD is shippable.
# Usage: tools/gate.sh [--full]
#   default: Test/compile + EntrySmoke (~30 s)
#   --full : also runs the whole ScalaTest suite (~2.5 min)
# Rounds 6 and 7 shipped a non-compiling HEAD; nothing in the round
# protocol ran the compiler before snapshot. This script is that gate —
# run it before EVERY commit.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[gate] sbt Test/compile"
sbt -batch "Test/compile" > /tmp/gate_compile.log 2>&1 || {
  echo "[gate] COMPILE FAILED"; tail -30 /tmp/gate_compile.log; exit 1; }

echo "[gate] EntrySmoke"
rows=$(sbt -batch 'runMain graft.EntrySmoke' 2>&1 | grep -oP 'ENTRY_ROWS=\K\d+' || echo 0)
if [ "${rows:-0}" -le 0 ]; then
  echo "[gate] ENTRY SMOKE FAILED (rows=$rows)"; exit 1
fi
echo "[gate] entry rows=$rows"

if [ "${1:-}" = "--full" ]; then
  echo "[gate] sbt test"
  sbt -batch test > /tmp/gate_test.log 2>&1 || {
    echo "[gate] TESTS FAILED"; grep -E 'TESTS? FAILED|\*\*\* FAILED' /tmp/gate_test.log | head -20
    tail -20 /tmp/gate_test.log; exit 1; }
  tail -5 /tmp/gate_test.log
fi
echo "[gate] GREEN"
