#!/usr/bin/env bash
# Format the codebase (the reference ships .dev/climaformat.jl; this is the
# Python analogue). Usage: .dev/format.sh [--check]
set -euo pipefail
cd "$(dirname "$0")/.."
ARGS=()
[[ "${1:-}" == "--check" ]] && ARGS+=(--check --diff)
exec black "${ARGS[@]}" landhydrology_tpu tests experiments bench.py __graft_entry__.py
