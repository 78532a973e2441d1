#!/usr/bin/env bash
# Replay both .gitlab-ci.yml tiers against the local environment — the
# proof that the CI recipe actually runs (there is no GitLab runner in
# this environment). Mirrors the job scripts exactly, minus the pip
# install (deps are baked into the image; pyproject.toml pins the same
# set the CI installs: jax[cpu], numpy, pytest).
#
# Usage: scripts/ci_local.sh [fast|full|both]   (default: both)
set -euo pipefail
cd "$(dirname "$0")/.."

tier="${1:-both}"

make -C idg_tpu/native || echo "native build skipped"

if [[ "$tier" == "fast" || "$tier" == "both" ]]; then
    echo "=== tier: test-fast (-m 'not slow') ==="
    python -m pytest tests/ -q -m "not slow"
fi

if [[ "$tier" == "full" || "$tier" == "both" ]]; then
    echo "=== tier: test-full ==="
    python -m pytest tests/ -q
fi
