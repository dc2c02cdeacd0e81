"""Options carrier for Reader/Writer (reference: internal/pkg/opts/opts.go
and the ~20 functional options in plz4_opts.go).

Invalid numeric inputs are clamped, not errored, matching the reference
(plz4_opts.go:140-146 level clamp, :160-164 block-size clamp).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from .frame import descriptor as desc

# progress(src_offset, dst_position) — emitted per block in frame order
ProgressFn = Callable[[int, int], None]
# skip_callback(reader, nibble, size)
SkipCallbackFn = Callable[[object, int, int], None]
# dict_callback(dict_id) -> bytes | None — override dictionary by frame id
DictCallbackFn = Callable[[int], Optional[bytes]]

DEFAULT_BLOCK_IDX = desc.BLOCK_IDX_4MB
MIN_LEVEL, MAX_LEVEL = 1, 12
WINDOW_SIZE = 65536  # LZ4 match window / linked-block dictionary span


def clamp_level(level: int) -> int:
    return max(MIN_LEVEL, min(MAX_LEVEL, int(level)))


def resolve_parallel(parallel: int) -> int:
    """<0 = auto (cpu count); 0 = sync; n>0 = n workers.

    Reference: WithParallel, plz4_opts.go:70-79.
    """
    if parallel < 0:
        return os.cpu_count() or 1
    return parallel


def calc_pending(pending_size: int, parallel: int, block_size_idx: int) -> int:
    """In-flight block budget (reference: opts.CalcPending, opts/opts.go:62-95):
    -1 = auto-scale by block size (16x/8x/4x/2x parallel for 64K/256K/1M/4M);
    explicit values pass through with a floor of 1."""
    if parallel <= 0:
        return 1
    if pending_size >= 0:
        return max(1, pending_size)
    scale = {
        desc.BLOCK_IDX_64KB: 16,
        desc.BLOCK_IDX_256KB: 8,
        desc.BLOCK_IDX_1MB: 4,
        desc.BLOCK_IDX_4MB: 2,
    }[block_size_idx]
    return scale * parallel


@dataclass
class Options:
    # global
    parallel: int = -1            # <0 auto, 0 sync, n>0 workers
    pending_size: int = -1        # -1 auto (CalcPending)
    content_checksum: bool = True
    progress: Optional[ProgressFn] = None
    dictionary: Optional[bytes] = None
    worker_pool: Optional[object] = None  # object with submit(fn) -> future
    # "native" | "device" | "auto". DEVICE LEVEL MAPPING: the device
    # (TPU) backend has four parse-quality families, not twelve levels —
    # levels <= 2 run the greedy kernel, levels 3-7 the depth-2 chain
    # ("mid") kernel, level 8 the depth-4 chain (two more candidate
    # tables; -0.6..-7.5% size for ~-19% speed), and levels >= 9 the
    # deep hash-chain finder with lazy matching (walk budget 2/8/16/32
    # at 9/10/11/12; on-chip ratio 2.439/2.474/2.489/2.492 at
    # 21.8/14.7/12.4/11.8 MB/s per chip vs native L12's 2.522;
    # dict/linked calls at the full 64 KiB window run the
    # u16-delta-chain variant: full chain depth, window truncated to
    # 32 KiB). Requesting backend="device", level=12
    # buys the deep-tier ratio at device throughput — a stated trade
    # (pinned by test_device_backend.py::test_device_level_mapping),
    # not native-L12 parity everywhere. Use backend="native" when
    # maximum ratio matters more than device residency.
    backend: str = "auto"
    # write-side
    level: int = 1
    block_checksum: bool = False
    block_size_idx: int = DEFAULT_BLOCK_IDX
    block_linked: bool = False
    content_size: Optional[int] = None
    dict_id: Optional[int] = None
    # read-side
    read_offset: Optional[int] = None
    content_size_check: bool = True
    skip_callback: Optional[SkipCallbackFn] = None
    dict_callback: Optional[DictCallbackFn] = None
    # device engine tuning
    device_batch: int = 0         # 0 = auto per block size

    def __post_init__(self) -> None:
        self.level = clamp_level(self.level)
        if self.block_size_idx not in desc.BLOCK_SIZES:
            # accept a byte count and clamp to the nearest class
            self.block_size_idx = desc.block_size_to_idx(int(self.block_size_idx))
        if self.dictionary is not None and len(self.dictionary) > WINDOW_SIZE:
            # only the last 64 KiB is usable window (reference: dupeDict,
            # compress/dict.go:186-199)
            self.dictionary = self.dictionary[-WINDOW_SIZE:]
        if self.backend not in ("native", "device", "auto"):
            raise ValueError(f"unknown backend {self.backend!r}")
        # All four BD block sizes (64 KiB..4 MiB, descriptor/index.go:
        # 92-125) are supported on every backend. The device engine's
        # Pallas kernels are SMEM-resident and chunk-sized, so blocks
        # larger than 64 KiB are encoded as parallel window-prefixed
        # 64 KiB chunks stitched into standard LZ4 blocks, and decoded
        # as a sequential on-device record scan (parallel/large.py).
        # 64 KiB blocks remain the device throughput sweet spot.

    @property
    def block_size(self) -> int:
        return desc.block_idx_to_size(self.block_size_idx)

    def resolved_parallel(self) -> int:
        return resolve_parallel(self.parallel)

    def pending_budget(self) -> int:
        return calc_pending(
            self.pending_size, self.resolved_parallel(), self.block_size_idx)
