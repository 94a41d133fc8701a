#!/usr/bin/env bash
# Test-suite entry point (reference run_all_tests.sh contract): environment
# check, dependency probe, full suite via tests/run_tests.py with report.
set -u
cd "$(dirname "$0")"

if ! command -v python >/dev/null 2>&1; then
    echo "ERROR: python not found on PATH" >&2
    exit 1
fi

echo "=============================================="
echo " timecrystal_tpu test suite"
echo "=============================================="
python - <<'PY'
import sys
print(f"python {sys.version.split()[0]}")
try:
    import jax
    print(f"jax {jax.__version__}")
except ImportError:
    sys.exit("ERROR: jax is required")
PY
[ $? -ne 0 ] && exit 1

exec python tests/run_tests.py "$@"
