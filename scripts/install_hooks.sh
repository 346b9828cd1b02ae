#!/bin/bash
# Install the repo's git hooks (git does not version .git/hooks).
# Run once per clone; CLAUDE.md documents this.
set -e
cd "$(dirname "$0")/.."
install -m 755 scripts/pre-commit-gate.sh .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit (engine-commit battery gate)"
