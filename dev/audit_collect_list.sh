#!/usr/bin/env bash
# Audit: every collect_list in src/main must be row-bounded BY CONSTRUCTION
# and say so on the call line with a `// bounded: <why>` marker.
#
# An unbounded per-group list is the hot-row scale killer: one viral
# boilerplate text at crawl scale puts billions of member ids into a single
# aggregation-buffer row (the shape GraphOps/exactDupes explicitly design
# out). This gate makes it impossible to reintroduce one unnoticed — a new
# collect_list without a justified bound fails the script.
set -euo pipefail
cd "$(dirname "$0")/.."
bad=$(grep -rn "collect_list" src/main/scala --include='*.scala' \
  | grep -v -E '^\S+:[0-9]+:\s*(\*|//)' \
  | grep -v "bounded:" || true)
if [[ -n "$bad" ]]; then
  echo "UNBOUNDED collect_list (add a real bound + '// bounded: <why>' marker):" >&2
  echo "$bad" >&2
  exit 1
fi
echo "collect_list audit: OK (all uses carry a bounded: justification)"
