#!/bin/sh
# Install the repo's git hooks (idempotent).
cd "$(git rev-parse --show-toplevel)" || exit 1
ln -sf ../../tools/pre-commit .git/hooks/pre-commit
chmod +x tools/pre-commit
echo "installed: .git/hooks/pre-commit -> tools/pre-commit"
