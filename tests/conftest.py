"""Test harness configuration.

Tests run hardware-independent, mirroring how the reference keeps its whole
suite runnable on any CI box: we force the CPU backend with a virtual 8-device
mesh so the multi-chip sharding paths (shard_map over a Mesh) are exercised
without a TPU pod.  Pallas kernels run in interpret mode under this backend.

Must set env vars before jax is imported anywhere.
"""

import os
import pathlib

# Force-set: the environment may pin JAX_PLATFORMS to a TPU plugin (e.g. the
# axon relay, which holds an exclusive claim on the single chip — letting the
# test suite touch it would serialize test runs behind any other TPU user).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A TPU plugin registered at interpreter start (sitecustomize) may have set
# the platform config directly; override it before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import pytest

ASSETS = pathlib.Path(__file__).resolve().parent.parent / "test-assets"


@pytest.fixture(scope="session")
def lorem_ipsum() -> bytes:
    return (ASSETS / "lorem_ipsum.txt").read_bytes()


@pytest.fixture(scope="session")
def lorem_ipsum_encoded() -> bytes:
    """Golden ciphertext: variable LE cs=7 encode of lorem_ipsum.txt."""
    return (ASSETS / "lorem_ipsum_encoded.bin").read_bytes()


@pytest.fixture(scope="session")
def tokyo_pixels() -> bytes:
    """Indexed pixel data (values 0..128) of tokyo_128_colors.png.

    The reference benchmarks on the decoded index plane
    (`benches/compare_crates.rs:276-287`); we decode the PNG the same way.
    """
    from lzw_tpu.utils.corpus import load_tokyo_pixels

    return load_tokyo_pixels(ASSETS / "tokyo_128_colors.png")


@pytest.fixture(scope="session")
def sunflower_bytes() -> bytes:
    return (ASSETS / "sunflower.bmp").read_bytes()
