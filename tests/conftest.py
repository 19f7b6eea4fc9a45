"""Test configuration: force an 8-device virtual CPU mesh before jax import.

All tests run on CPU — the harness presets JAX_PLATFORMS=axon (the real TPU
tunnel, with high per-call latency), which we override unconditionally here;
the real chip is reserved for bench.py.  Multi-chip sharding logic is
exercised on the virtual 8-device mesh (SURVEY.md §4: test pyramid built
from scratch; multi-host logic validated via XLA CPU simulation).
"""

import os

# The harness' sitecustomize imports jax at interpreter boot with
# JAX_PLATFORMS=axon already captured into jax.config, so mutating the
# environment alone is not enough — update the config before any backend
# is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover - older jax uses the XLA flag instead
    pass

from otti_tpu.runtime import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xD15C0)
