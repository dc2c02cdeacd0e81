"""LZ4 Frame wire format — host-side, bit-for-bit spec compliant.

Reference layer L3 (SURVEY.md §1): internal/pkg/{header,descriptor,trailer,blk}.
"""

from .descriptor import (  # noqa: F401
    BLOCK_IDX_64KB,
    BLOCK_IDX_256KB,
    BLOCK_IDX_1MB,
    BLOCK_IDX_4MB,
    BLOCK_SIZES,
    DATA_UNCOMPRESSED_BIT,
    block_idx_to_size,
    block_size_to_idx,
)
from .header import (  # noqa: F401
    FRAME_MAGIC,
    MAX_HEADER_SIZE,
    MIN_HEADER_SIZE,
    SKIP_MAGIC_BASE,
    FrameHeader,
    read_header,
    write_header,
    write_skip_header,
)
from .trailer import write_trailer  # noqa: F401
