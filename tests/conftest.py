import os
import sys

# Unit tests run on a virtual 8-device CPU mesh so multi-chip sharding
# logic is exercised without TPU hardware.  Must be set before jax imports,
# and must OVERRIDE the environment (the driver exports JAX_PLATFORMS=axon
# for the real chip; running unit tests there is slow and bf16-imprecise).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Full-precision f32 matmuls for numeric parity tests (the platform plugin
# defaults to bf16-grade matmul precision even on CPU).  The jaxtyping pytest
# plugin imports jax BEFORE this conftest runs, which bakes the env's
# JAX_PLATFORMS (the real chip) into jax.config — override via config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def data_dir():
    from pathlib import Path

    return Path("/root/reference/tests/data")
