"""plz4_tpu — TPU-native parallel LZ4 Frame codec (JAX/XLA/Pallas).

A from-scratch framework with the capabilities of prequel-dev/plz4: parallel
LZ4 Frame encode/decode with independent and linked blocks, levels 1-12,
block/content xxHash-32 checksums, dictionaries, skippable frames, frame
concatenation, random read access, a raw block API, and a CLI — with the hot
block codec running as batched, sharded JAX computations on TPU and a native
C++ host codec for the serial/sync paths.
"""

def _tune_allocator() -> None:
    """Pin glibc's mmap/trim thresholds so multi-MB buffers (block batches,
    one-shot outputs) are served from reusable heap pages instead of fresh
    mmaps. Fresh mmap pages must be demand-faulted on every call — measured
    at >500 ms per 32 MiB under this class of VM — while recycled heap pages
    are free. Opt out with PLZ4_NO_MALLOPT=1."""
    import ctypes
    import os

    if os.environ.get("PLZ4_NO_MALLOPT"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # non-glibc platforms: best effort only
        pass


_tune_allocator()

from . import errors  # noqa: F401,E402
from .api import (  # noqa: F401
    DictContext,
    Reader,
    Writer,
    compress,
    compress_block,
    compress_block_bound,
    decompress,
    decompress_block,
    write_skip_frame_header,
)
from .errors import is_corrupted  # noqa: F401
from .frame.descriptor import (  # noqa: F401
    BLOCK_IDX_64KB,
    BLOCK_IDX_256KB,
    BLOCK_IDX_1MB,
    BLOCK_IDX_4MB,
)
from .opts import Options  # noqa: F401

__version__ = "0.1.0"


def force_cpu_if_requested() -> None:
    """Apply JAX_PLATFORMS=cpu as a config update. The env var alone does
    NOT displace an environment-preset platform (e.g. a TPU tunnel); the
    config update does. Call before the first jax use in any entry point
    that honors the variable (tests' conftest, bench_scaling, examples)."""
    import os as _os

    if "cpu" in _os.environ.get("JAX_PLATFORMS", ""):
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")


def enable_compile_cache(path: str = "/tmp/plz4_tpu_jax_cache") -> None:
    """Enable JAX's persistent compilation cache for the codec kernels.

    The device encode/decode graphs are large; caching makes process
    startup fast after the first run. Safe to call multiple times.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
