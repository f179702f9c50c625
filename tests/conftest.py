"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere in the test process.

Set ``CRIMAC_TEST_TPU=1`` to run on the real TPU instead (numeric
hardware validation; mesh-dependent tests that need 8 devices will skip
or fail on a single chip — select numeric suites explicitly, e.g.
``CRIMAC_TEST_TPU=1 pytest tests/test_ops.py tests/test_model.py``).
Only ONE process may use the TPU at a time.
"""

import os

_ON_TPU = os.environ.get("CRIMAC_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force off the real TPU
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _ON_TPU:
    # The installed axon TPU plugin ignores the JAX_PLATFORMS env var;
    # the config API does take effect.
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU compiles go through the axon tunnel (minutes per program on a
    # bad day) — reuse the persistent compilation cache bench.py uses so
    # repeated hardware validation only pays the compile once
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", "xla")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
from pathlib import Path

# repo root on sys.path so `crimac_unet_tpu` imports without installation
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
