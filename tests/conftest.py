"""Test config: force CPU platform with 8 virtual devices so sharding
tests run without TPU hardware (mirrors the driver's dryrun setup).

NOTE: jax is preloaded by the environment's sitecustomize with the TPU
platform selected, so the env var alone is too late — we must override
via jax.config before any backend initialization.
"""
import os

# must come before first backend init (jax itself may already be imported)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

DEMO_DIR = "/root/reference/src/demo/data"


@pytest.fixture(scope="session")
def demo_fasta():
    return os.path.join(DEMO_DIR, "demo20.fa")


@pytest.fixture(scope="session")
def demo_bams():
    return [
        os.path.join(DEMO_DIR, "NA12891_demo20.bam"),
        os.path.join(DEMO_DIR, "NA12892_demo20.bam"),
    ]
