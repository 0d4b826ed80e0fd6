#!/usr/bin/env bash
# Build the C++ host-side kernels in place.
set -e
cd "$(dirname "$0")/.."
python setup.py build_ext --inplace
python - <<'EOF'
from tspn_tpu.native import HAVE_NATIVE
print("native kernels available:", HAVE_NATIVE)
assert HAVE_NATIVE
EOF
