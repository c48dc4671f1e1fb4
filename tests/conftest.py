"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so the
platform must be forced through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# One ILP group in the Pallas-interpret tests: G only changes scheduling on
# hardware, and interpret-mode wall time scales with G.  The G-machinery
# itself is covered by test_pallas_fused.test_paired_ilp_groups.
os.environ.setdefault("DSR_ILP_GROUPS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # function-scoped: each test draws from a fresh, identical stream, so a
    # test's data cannot depend on which tests ran before it (a
    # session-scoped generator made assertions order-dependent)
    return np.random.default_rng(12345)
