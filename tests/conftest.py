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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


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
