"""Runtime/bootstrap helpers: platform selection + persistent compile cache.

This environment's quirks (captured in .claude/skills/verify/SKILL.md):
the harness boots jax with JAX_PLATFORMS=axon (live TPU tunnel) via
sitecustomize, eager dispatch is slow, and XLA:CPU compiles are
expensive — so scripts/tests force CPU explicitly and every process
shares an on-disk compilation cache.
"""

from __future__ import annotations

import os

import jax

_CACHE_DIR = os.environ.get(
    "OTTI_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)


def enable_compile_cache():
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - older jax
        pass


def force_cpu(n_devices: int = 8):
    """Use the virtual CPU mesh (tests/dev); call before any computation."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", n_devices)
    except Exception:  # pragma: no cover
        pass
    enable_compile_cache()


def use_tpu():
    """Run on the real chip (bench): keep the preset axon platform."""
    enable_compile_cache()
