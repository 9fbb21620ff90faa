"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests (shard_map/pjit over a Mesh) execute without TPU hardware, and keep
compile times/determinism sane. Real-chip benchmarking goes through bench.py.
"""

import os
import sys

# Must be set before jax is imported anywhere. Force CPU: the ambient env
# points JAX_PLATFORMS at the single real TPU chip (axon), but tests need a
# virtual 8-device mesh and fast recompiles; bench.py uses the real chip.
# ZKPOA_TEST_TPU=1 keeps the ambient platform — used by the chip queue to
# run the gated heavy e2e tests (ZKPOA_HEAVY_TESTS) on real hardware.
_USE_TPU = os.environ.get("ZKPOA_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: the unrolled limb kernels are compile-heavy.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zkpoa_jax_cache")
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms="axon,cpu" via jax.config.update, which overrides env vars.
# Re-override here (runs before any test imports build arrays).
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def reference_path(*parts: str) -> str:
    return os.path.join(REFERENCE_ROOT, *parts)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
