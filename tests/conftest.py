"""Test config: run on a virtual 8-device CPU mesh (SURVEY §4d).

Tests must be deterministic and runnable without TPU hardware; multi-chip
sharding tests use xla_force_host_platform_device_count=8.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (TPU tunnel), which makes
# every test compile through the tunnel (~seconds per jit).  Tests are
# correctness-only and must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# 2-vCPU host: XLA compiles dominate test time. Cache compiled executables
# across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pcr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize calls register() at interpreter start, which sets the
# jax_platforms *config* to "axon,cpu" — overriding the env var.  Force the
# config back to cpu before any backend is touched.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_rotation(rng) -> np.ndarray:
    """Haar-ish random rotation via QR."""
    A = rng.normal(size=(3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(R))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    return Q


@pytest.fixture
def random_rotation_fn(rng):
    return lambda: random_rotation(rng)
