"""Test config: force an 8-device CPU mesh before jax initialises.

This is the TPU analog of "test multi-node without a cluster" (SURVEY.md §4):
sharding tests run on 8 virtual CPU devices.
"""

import os

# NOTE: in this environment the 'axon' TPU plugin IGNORES the JAX_PLATFORMS env
# var — the config flag is the only thing that actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
# Pallas kernels run in the interpreter on the CPU test mesh
os.environ.setdefault("NEUROSIS_PALLAS_INTERPRET", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Golden parity tests need full-fp32 matmuls (default is bf16-class on MXU).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session", autouse=True)
def _smoke_root(tmp_path_factory):
    """Point the smoke configs' default_root_dir at a temp dir so suite runs
    never append to tracked files under projects/."""
    os.environ.setdefault("NEUROSIS_SMOKE_ROOT", str(tmp_path_factory.mktemp("smoke_root")))
