#!/bin/sh
# Canonical full-suite runner.
#
# Runs the suite across isolated worker processes (pytest-xdist) so no
# single process accumulates enough XLA:CPU in-process compiles to hit the
# loader segfault that killed serial runs at the ~165th compile (round-3
# review "what's weak" #2; the crash is inside XLA:CPU
# backend_compile_and_load, independent of which test runs last).
# --dist loadfile keeps a file's tests on one worker so module/session
# fixtures (compiled cbox scenes) build once per file, not once per test.
#
# Usage:  sh tests/run_suite.sh            # whole suite
#         WORKERS=2 sh tests/run_suite.sh  # fewer workers (1-core hosts)
#         sh tests/run_suite.sh tests/test_rng.py   # subset, same isolation
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests -q -n "${WORKERS:-4}" --dist loadfile \
    --max-worker-restart 0 "$@"
