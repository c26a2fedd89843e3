"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding/halo tests exercise a
``jax.sharding.Mesh`` built from 8 virtual CPU devices
(``--xla_force_host_platform_device_count=8``), and the numerical oracles run in
float64 (``jax_enable_x64``) to expose the reference's convergence orders.
These env settings must land before the first ``import jax``.
"""

import os

# LSM_TPU_TESTS=1 keeps the real TPU backend (and f32) so the compiled-Pallas
# parity tests in test_tpu_compiled.py can run on hardware:
#     LSM_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q
# The rest of the suite is calibrated for the f64 CPU mesh and should not be
# run in this mode.
_TPU_MODE = os.environ.get("LSM_TPU_TESTS") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env ships JAX_PLATFORMS=axon
    _flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU_MODE:
    # The axon (TPU-tunnel) plugin registers itself from sitecustomize and
    # hard-sets jax_platforms to "axon,cpu" — env vars alone cannot force CPU;
    # override the config after import.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    # persistent compilation cache: remote TPU compiles through the tunnel
    # dominate the suite's runtime; repeat runs hit the cache
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lsm_tpu_jaxcache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

#: modules safe to run against the real chip (f32, compiled Pallas)
_TPU_SAFE = {"test_tpu_compiled.py"}


def pytest_collection_modifyitems(config, items):
    """In TPU mode, auto-skip everything not marked TPU-safe: the rest of the
    suite is calibrated for the f64 CPU mesh (convergence thresholds, x64
    reprs) and would fail spuriously on the chip (ADVICE r2)."""
    if not _TPU_MODE:
        return
    skip = pytest.mark.skip(reason="f64/CPU-mesh test skipped under LSM_TPU_TESTS=1")
    for item in items:
        if os.path.basename(str(item.fspath)) not in _TPU_SAFE:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def convergence_orders(errors, ns):
    """Observed convergence orders from an N-sweep (reference helper
    ``_convergence_orders``, ``test/test-levelsetequation.jl:8-10``)."""
    errors = [float(e) for e in errors]
    return [
        np.log(errors[i] / errors[i + 1]) / np.log(ns[i + 1] / ns[i])
        for i in range(len(ns) - 1)
    ]
