#!/bin/bash
# STANDING PRE-CLOSE GATE (r13 verdict item 7): the four queries that
# went driver-red in rounds 11-13 (t43/t56/q145/t60 — root cause: a
# HUGEINT-typed oracle result column turning float64 through a
# pandas-based compare; fixed in round 14 by explicit CASTs plus the
# compare.py portable-type gate) are re-verified at BOTH SFs before
# every round close: the 4-config determinism matrix (cpus 4/8/32, AQE
# forced on) AND a DuckDB value compare per SF. All four re-verify in
# under a minute per configuration, so this runs every round.
#
# Usage: tools/preclose.sh [sfDir ...]   (exit 0 = gate green)
#   SF dirs default to /root/testdata/sf0.01 /root/testdata/sf0.1;
#   GRAFT_STABILITY_OUT overrides the stability matrix out dir
#   (default /tmp/graft-stability — must match tools/stability.sh).
# The per-SF verdict is also persisted to preclose_evidence.json next
# to this script's repo root (r14 verdict item 6), so the gate's result
# is readable from the tree like the canon evidence.
set -u
REDS="t43_mixture_budget,t56_shard_assign,q145_srm_check,t60_heaps_law"
SF_DIRS=("$@")
[ ${#SF_DIRS[@]} -eq 0 ] && SF_DIRS=(/root/testdata/sf0.01 /root/testdata/sf0.1)
STAB_OUT="${GRAFT_STABILITY_OUT:-/tmp/graft-stability}"
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
FAILED=0
RESULTS=""
for SF in "${SF_DIRS[@]}"; do
  echo "==== preclose gate: formerly-red queries @ $SF ===="
  SF_OK=true
  if ! tools/stability.sh "$SF" "$REDS"; then
    echo "PRECLOSE FAIL: stability matrix diverged at $SF"
    FAILED=1; SF_OK=false
  fi
  # value + portable-type compare on the cpus32 run's outputs; only the
  # four gated queries count (everything else reports "no spark output"
  # in a subset run by design)
  CMP=$(python3 tools/compare.py "$SF" "$STAB_OUT/cpus32" \
        | grep -E "^(PASS|FAIL) (t43_|t56_|q145_|t60_)")
  echo "$CMP"
  if echo "$CMP" | grep -q "^FAIL" || [ "$(echo "$CMP" | grep -c '^PASS')" -ne 4 ]; then
    echo "PRECLOSE FAIL: oracle compare not 4/4 at $SF"
    FAILED=1; SF_OK=false
  fi
  RESULTS="$RESULTS{\"sf\":\"$SF\",\"green\":$SF_OK},"
done
if [ "$FAILED" -eq 0 ]; then
  echo "PRECLOSE GATE GREEN: 4/4 queries stable + oracle-green at both SFs"
fi
printf '{"written_at":"%s","queries":"%s","green":%s,"per_sf":[%s]}\n' \
  "$(date -u +%Y-%m-%dT%H:%M:%SZ)" "$REDS" \
  "$([ "$FAILED" -eq 0 ] && echo true || echo false)" \
  "${RESULTS%,}" > "$REPO_ROOT/preclose_evidence.json"
echo "[preclose-evidence] wrote $REPO_ROOT/preclose_evidence.json"
exit "$FAILED"
