"""plz4_tpu — TPU-native parallel LZ4 Frame codec (JAX/XLA/Pallas).

A from-scratch framework with the capabilities of prequel-dev/plz4: parallel
LZ4 Frame encode/decode with independent and linked blocks, levels 1-12,
block/content xxHash-32 checksums, dictionaries, skippable frames, frame
concatenation, random read access, a raw block API, and a CLI — with the hot
block codec running as batched, sharded JAX computations on TPU and a native
C++ host codec for the serial/sync paths.
"""

from . import errors  # noqa: F401
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


def enable_compile_cache(path: str = "/tmp/plz4_tpu_jax_cache") -> None:
    """Enable JAX's persistent compilation cache for the codec kernels.

    The device encode/decode graphs are large; caching makes process
    startup fast after the first run. Safe to call multiple times.
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
