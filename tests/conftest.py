"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU pod hardware (the driver separately dry-runs the
multi-chip path). Must be set before JAX initializes its backends.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the remote TPU
# tunnel (and an axon sitecustomize re-registers it in every process), which
# must not be touched by unit tests. The env var alone is overridden by the
# plugin, so also force the platform through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Full f32 matmul/conv precision: symbol-level parity checks need it.
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: XLA CPU compiles are slow on small machines.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

try:  # torch oracles: a single thread avoids OpenMP/XLA threadpool deadlocks
    import torch  # noqa: E402

    torch.set_num_threads(1)
except ImportError:  # pragma: no cover
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
