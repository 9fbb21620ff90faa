#!/usr/bin/env bash
# Environment bootstrap — the reference's machine_initialization.sh analog
# (scripts/machine_initialization.sh there builds circom/node/rapidsnark
# from source; here the stack is Python/JAX + one C++ shared library).
# Idempotent: safe to re-run, picks up where it left off.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== zkpoa-tpu bootstrap =="

# 1. Python deps (already baked into the TPU images; pip only if missing)
python - <<'EOF'
import importlib, sys
missing = [m for m in ("jax", "numpy", "pytest") if importlib.util.find_spec(m) is None]
if missing:
    sys.exit(f"missing python deps: {missing}; install jax+numpy+pytest first")
print("python deps: ok")
EOF

# 2. Native C++ engines (Poseidon-Merkle twin + R1CS evaluator)
if command -v g++ >/dev/null; then
  python - <<'EOF'
from zkpoa_tpu.native import r1cs_eval
import zkpoa_tpu.native as pn
print("native poseidon/merkle:", "ok" if pn.available() else "UNAVAILABLE")
print("native r1cs evaluator:", "ok" if r1cs_eval.available() else "UNAVAILABLE")
EOF
else
  echo "g++ not found: native fast paths disabled (pure JAX/Python fallback)"
fi

# 3. Device check
python - <<'EOF'
import jax
print("jax backend:", jax.default_backend(), "devices:", jax.devices())
EOF

# 4. Persistent compile cache (the unrolled limb kernels are compile-heavy)
mkdir -p "${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/zkpoa_jax}"
echo "compile cache: ${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/zkpoa_jax}"

# 5. Smoke test
python -m pytest tests/test_fields_host.py -q -m "not slow" | tail -1
echo "== bootstrap done =="
