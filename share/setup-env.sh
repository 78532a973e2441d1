#!/usr/bin/env bash
# Environment setup (the reference's share/setup-env.sh analogue): put the
# framework on PYTHONPATH and enable the persistent compile cache.
export PYTHONPATH="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd):${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_idg}"
