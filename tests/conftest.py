"""Test configuration.

Sharding tests run on a virtual 8-device CPU mesh; set platform/device-count
flags BEFORE jax initializes (the driver's bench run uses the real TPU chip
instead — this env only applies to pytest).
"""

import os

# Force CPU regardless of the ambient platform (the environment presets
# JAX_PLATFORMS=axon for the real chip; tests must not depend on the TPU
# tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: decode/encode graphs are large; caching cuts
# suite time drastically across runs.
import jax  # noqa: E402

# The env var alone does not displace the preset axon platform; the config
# update does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/plz4_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x124)


def make_compressible(n: int, seed: int = 7) -> bytes:
    """Synthetic text-like payload: random words from a small vocabulary,
    approximating Silesia-style compressibility."""
    r = np.random.default_rng(seed)
    vocab = [
        b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ", b"lazy ",
        b"dog ", b"compression ", b"lz4 ", b"frame ", b"block ", b"tpu ",
        b"kernel ", b"hash ", b"match ", b"token ", b"stream ", b"\n",
    ]
    out = bytearray()
    while len(out) < n:
        out += vocab[int(r.integers(len(vocab)))]
    return bytes(out[:n])


def make_incompressible(n: int, seed: int = 9) -> bytes:
    return np.random.default_rng(seed).integers(0, 256, n, dtype=np.uint8).tobytes()


@pytest.fixture(scope="session")
def text_1mb():
    return make_compressible(1 << 20)


@pytest.fixture(scope="session")
def random_64kb():
    return make_incompressible(1 << 16)
