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
# Usage: tools/preclose.sh       (exit 0 = gate green)
set -u
REDS="t43_mixture_budget,t56_shard_assign,q145_srm_check,t60_heaps_law"
FAILED=0
for SF in /root/testdata/sf0.01 /root/testdata/sf0.1; do
  echo "==== preclose gate: formerly-red queries @ $SF ===="
  if ! tools/stability.sh "$SF" "$REDS"; then
    echo "PRECLOSE FAIL: stability matrix diverged at $SF"
    FAILED=1
  fi
  # value + portable-type compare on the cpus32 run's outputs; only the
  # four gated queries count (everything else reports "no spark output"
  # in a subset run by design)
  CMP=$(python3 tools/compare.py "$SF" /tmp/graft-stability/cpus32 \
        | grep -E "^(PASS|FAIL) (t43_|t56_|q145_|t60_)")
  echo "$CMP"
  if echo "$CMP" | grep -q "^FAIL" || [ "$(echo "$CMP" | grep -c '^PASS')" -ne 4 ]; then
    echo "PRECLOSE FAIL: oracle compare not 4/4 at $SF"
    FAILED=1
  fi
done
if [ "$FAILED" -eq 0 ]; then
  echo "PRECLOSE GATE GREEN: 4/4 queries stable + oracle-green at both SFs"
fi
exit "$FAILED"
