#!/bin/sh
# Full (RUN_SLOW) suite runner — three fresh pytest processes.
#
# Why not one process: the complete ~320-test tier in a single process
# segfaults (SIGSEGV, rc=139) late in the run inside XLA:CPU's
# backend.deserialize_executable during a persistent-compilation-cache read
# (jax compilation_cache.get_executable_and_time) — reproduced twice at the
# ~70% mark in r5, while every chunk passes in a fresh process and the
# default core tier (python -m pytest tests/ -q) is unaffected. The crash is
# inside jaxlib C++ (long-lived-process state + cache deserialize), not in
# framework code; process-per-chunk bounds that state.
set -e
cd "$(dirname "$0")"
export RUN_SLOW=1 PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu
python -m pytest tests/test_[a-d]*.py -q "$@"
python -m pytest tests/test_[e-m]*.py -q "$@"
python -m pytest tests/test_[n-z]*.py -q "$@"
