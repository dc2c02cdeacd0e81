"""plz4_tpu usage examples (reference analog: docs/examples/example.go)."""

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import plz4_tpu as plz4  # noqa: E402


def one_shot():
    data = b"the quick brown fox jumps over the lazy dog " * 1000
    comp = plz4.compress(data, level=6)
    assert plz4.decompress(comp) == data
    print(f"one-shot: {len(data)} -> {len(comp)} bytes")


def streaming_with_options():
    data = b"streaming payload " * 50_000
    out = io.BytesIO()
    offsets = []  # (src_offset, dst_position) pairs: a seek index

    with plz4.Writer(
        out,
        level=9,
        block_size_idx=plz4.BLOCK_IDX_64KB,
        block_checksum=True,
        content_size=len(data),
        progress=lambda src, dst: offsets.append((src, dst)),
    ) as w:
        for i in range(0, len(data), 8192):
            w.write(data[i : i + 8192])

    print(f"streaming: {len(data)} -> {out.tell()} bytes, "
          f"{len(offsets)} blocks")

    # random access: re-enter mid-stream at any recorded block boundary
    src_off, dst_pos = offsets[len(offsets) // 2]
    r = plz4.Reader(io.BytesIO(out.getvalue()), read_offset=dst_pos)
    rest = r.read()
    assert rest == data[src_off:]
    print(f"random access from block at dst={dst_pos}: {len(rest)} bytes")


def dictionaries():
    dict_ = b"common prefix material shared by all records " * 100
    record = dict_[:200] + b"unique suffix"
    comp = plz4.compress(record, dictionary=dict_, dict_id=42)
    assert plz4.decompress(comp, dictionary=dict_) == record
    print(f"dict: {len(record)} -> {len(comp)} bytes")


def skippable_frames():
    out = io.BytesIO()
    plz4.write_skip_frame_header(out, nibble=0x5, size=8)
    out.write(b"metadata")
    w = plz4.Writer(out)
    w.write(b"payload after user metadata")
    w.close()

    seen = []
    r = plz4.Reader(
        io.BytesIO(out.getvalue()),
        skip_callback=lambda rd, nib, sz: seen.append(rd.read(sz)),
    )
    assert r.read() == b"payload after user metadata"
    print(f"skippable frame carried: {seen[0]!r}")


def raw_blocks():
    data = b"block api payload " * 100
    blk = plz4.compress_block(data, level=12)
    assert plz4.decompress_block(blk, dst_size=len(data)) == data
    print(f"raw block: {len(data)} -> {len(blk)} bytes "
          f"(bound {plz4.compress_block_bound(len(data))})")


if __name__ == "__main__":
    one_shot()
    streaming_with_options()
    dictionaries()
    skippable_frames()
    raw_blocks()
