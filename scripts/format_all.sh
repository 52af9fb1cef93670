#!/usr/bin/env bash
# Format native C++ sources (reference analogue: scripts/format_all.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
CF=${CF:-clang-format}
if ! command -v "$CF" >/dev/null 2>&1; then
  echo "clang-format not found; skipping C++ formatting" >&2
  exit 0
fi
files=$(git ls-files | grep -E '\.(c|cc|cpp|cxx|h|hh|hpp|hxx)$' || true)
[ -z "$files" ] && exit 0
echo "$files" | xargs -r "$CF" -i
