"""Frame engine: pipelined block compression/decompression with ordered
emission, bounded in-flight budget, and error latching.

Reference layer L4 (SURVEY.md §1): internal/pkg/{rdr,sync,async}.
"""

from .writer import FrameWriter  # noqa: F401
from .reader import FrameReader  # noqa: F401
