"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests (shard_map/pjit over a Mesh) execute without TPU hardware, and keep
compile times/determinism sane. Real-chip benchmarking goes through bench.py.
"""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_path(*parts: str) -> str:
    return os.path.join(REFERENCE_ROOT, *parts)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
