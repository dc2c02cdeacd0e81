"""Test-facing alias of the upstream lz4 oracle (plz4_tpu.native.upstream).

Kept as a separate import name so conformance tests read naturally; the
implementation lives in the package where the CLI bakeoff also uses it.
"""

from plz4_tpu.native.upstream import *  # noqa: F401,F403
from plz4_tpu.native.upstream import (  # noqa: F401
    available,
    compress,
    compress_bound,
    compress_fast,
    compress_hc,
    compress_linked,
    decompress,
    unavailable_reason,
)
