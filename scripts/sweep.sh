#!/usr/bin/env bash
# End-of-round full-registry sweep artifact (VERDICT r8 item, r9 item 1).
#
# Replays EVERY registered query against its DuckDB oracle at both gate
# scale factors and writes the committed artifacts
#   SWEEP_r{N}_sf0.001.json  and  SWEEP_r{N}_sf0.01.json
# at the repo root.  Exits non-zero if any query fails, so the commit
# step cannot silently ship a red sweep.
#
# Usage:  scripts/sweep.sh <round-number>     e.g.  scripts/sweep.sh 10
set -euo pipefail
ROUND="${1:?usage: scripts/sweep.sh <round-number>}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
for SF in sf0.001 sf0.01; do
  OUT="SWEEP_r$(printf '%02d' "$ROUND")_${SF}.json"
  echo "== sweep $SF -> $OUT"
  SF="$SF" SWEEP_JSON="$OUT" python scripts/check_entry.py
done
echo "== sweep artifacts written; commit them with the round's last commit"
