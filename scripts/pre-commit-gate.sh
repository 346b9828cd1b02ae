#!/bin/bash
# Commit gate (VERDICT r4 #2): an engine-touching commit is rejected
# unless the on-chip battery artifact was regenerated WITH it — so an
# end-of-round snapshot commit cannot introduce hardware-unproven engine
# code by construction (rounds 3 and 4 both did exactly that).
#
# Installed as .git/hooks/pre-commit by scripts/install_hooks.sh (git
# does not version hooks; re-run the installer after a fresh clone).
#
# Checks, in order:
#   1. If any STAGED file is a device engine (synthesizer_tpu/ops/ or
#      synthesizer_tpu/models/ — the same derived set as
#      battery_fresh.sh), TPU_VERIFY.txt must be staged in the same
#      commit.
#   2. The staged TPU_VERIFY.txt must be newer on disk than every staged
#      engine file (the battery ran AFTER the last engine edit, not
#      before it).
#
# Bypass for a genuine emergency: git commit --no-verify (leaves
# battery_fresh.sh failing at HEAD, which the round gate catches).
set -e
cd "$(git rev-parse --show-toplevel)"

staged=$(git diff --cached --name-only)
engines=$(echo "$staged" | grep -E '^synthesizer_tpu/(ops|models)/' || true)
[ -z "$engines" ] && exit 0

if ! echo "$staged" | grep -qx 'TPU_VERIFY.txt'; then
  echo "pre-commit gate: REJECTED — this commit touches device engines:" >&2
  echo "$engines" | sed 's/^/    /' >&2
  echo "but does not stage a regenerated TPU_VERIFY.txt.  Run the" >&2
  echo "on-chip battery (scripts/tpu_verify.py via tpu_run.sh or" >&2
  echo "scripts/round_check.sh step 7) and commit the artifact together" >&2
  echo "with the engine change (CLAUDE.md: re-prove the 1-LSB contract" >&2
  echo "after touching the render engines)." >&2
  exit 1
fi

newest_engine=0
for f in $engines; do
  [ -f "$f" ] || continue              # deletions can't be staler
  m=$(stat -c %Y "$f")
  [ "$m" -gt "$newest_engine" ] && newest_engine=$m
done
battery=$(stat -c %Y TPU_VERIFY.txt)
if [ "$newest_engine" -gt "$battery" ]; then
  echo "pre-commit gate: REJECTED — a staged engine file is newer on" >&2
  echo "disk than TPU_VERIFY.txt (the battery ran BEFORE the last" >&2
  echo "engine edit).  Re-run scripts/tpu_verify.py on the chip." >&2
  exit 1
fi
exit 0
