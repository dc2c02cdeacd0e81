"""End-to-end frame engine tests: option-matrix sweeps, flush, close
latching, concatenated frames, skip frames, dictionaries, linked blocks,
read-offset random access, progress callbacks.

Reference test analog: internal/test/wr_test.go (writeBasics ~20 configs x
parallel levels x interfaces) and rd_test.go feature suites.
"""

import io

import pytest

import plz4_tpu as plz4
from plz4_tpu import errors as zerr
from plz4_tpu.frame import descriptor as desc

from conftest import make_compressible, make_incompressible

PAYLOAD = make_compressible(300_000, seed=42)

CONFIGS = {
    "default": {},
    "level1": {"level": 1},
    "level6": {"level": 6},
    "level12": {"level": 12},
    "bs64k": {"block_size_idx": desc.BLOCK_IDX_64KB},
    "bs256k": {"block_size_idx": desc.BLOCK_IDX_256KB},
    "bs1m": {"block_size_idx": desc.BLOCK_IDX_1MB},
    "no_content_sum": {"content_checksum": False},
    "block_sum": {"block_checksum": True},
    "both_sums": {"block_checksum": True, "content_checksum": True},
    "content_size": {"content_size": len(PAYLOAD)},
    "linked": {"block_linked": True, "block_size_idx": desc.BLOCK_IDX_64KB},
    "linked_l6": {"block_linked": True, "level": 6,
                  "block_size_idx": desc.BLOCK_IDX_64KB},
    "small_blocks_all": {"block_size_idx": desc.BLOCK_IDX_64KB,
                         "block_checksum": True, "content_size": len(PAYLOAD)},
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
@pytest.mark.parametrize("parallel", [0, 1, -1])
def test_matrix_roundtrip(name, parallel):
    cfg = dict(CONFIGS[name])
    comp = plz4.compress(PAYLOAD, parallel=parallel, **cfg)
    out = plz4.decompress(comp, parallel=parallel)
    assert out == PAYLOAD


@pytest.mark.parametrize("name", ["default", "linked", "block_sum"])
def test_matrix_chunked_writes(name):
    cfg = dict(CONFIGS[name])
    out = io.BytesIO()
    w = plz4.Writer(out, parallel=2, **cfg)
    CH = 37_111
    for i in range(0, len(PAYLOAD), CH):
        w.write(PAYLOAD[i : i + CH])
    w.close()
    assert plz4.decompress(out.getvalue()) == PAYLOAD


def test_read_from_interface():
    out = io.BytesIO()
    w = plz4.Writer(out, parallel=2)
    n = w.read_from(io.BytesIO(PAYLOAD))
    w.close()
    assert n == len(PAYLOAD)
    assert plz4.decompress(out.getvalue()) == PAYLOAD


def test_write_to_interface():
    comp = plz4.compress(PAYLOAD)
    sink = io.BytesIO()
    r = plz4.Reader(io.BytesIO(comp))
    n = r.write_to(sink)
    r.close()
    assert n == len(PAYLOAD)
    assert sink.getvalue() == PAYLOAD


def test_empty_payload():
    for cfg in ({}, {"content_checksum": False}, {"block_checksum": True}):
        comp = plz4.compress(b"", **cfg)
        assert plz4.decompress(comp) == b""


def test_incompressible_payload():
    data = make_incompressible(500_000)
    comp = plz4.compress(data, block_size_idx=desc.BLOCK_IDX_64KB)
    # raw-block fallback keeps expansion bounded: size word overhead only
    assert len(comp) < len(data) + 4 * (len(data) // 65536 + 2) + 64
    assert plz4.decompress(comp) == data


def test_partial_reads():
    comp = plz4.compress(PAYLOAD)
    r = plz4.Reader(io.BytesIO(comp))
    got = bytearray()
    while True:
        b = r.read(7919)
        if not b:
            break
        assert len(b) > 0  # (0, nil) avoidance analog
        got += b
    assert bytes(got) == PAYLOAD


def test_flush_boundary():
    out = io.BytesIO()
    w = plz4.Writer(out, parallel=2, content_checksum=False)
    w.write(b"hello ")
    w.flush()
    pos_after_flush = out.tell()
    # everything before the flush point must decode standalone
    prefix = out.getvalue() + b"\x00\x00\x00\x00"  # synth EndMark
    assert plz4.decompress(prefix) == b"hello "
    w.write(b"world")
    w.close()
    assert out.tell() > pos_after_flush
    assert plz4.decompress(out.getvalue()) == b"hello world"


def test_flush_torture_one_byte_writes():
    out = io.BytesIO()
    w = plz4.Writer(out, parallel=2, block_size_idx=desc.BLOCK_IDX_64KB)
    data = make_compressible(300, seed=3)
    for i in range(len(data)):
        w.write(data[i : i + 1])
        if i % 17 == 0:
            w.flush()
    w.close()
    assert plz4.decompress(out.getvalue()) == data


def test_close_latching():
    out = io.BytesIO()
    w = plz4.Writer(out)
    w.write(b"data")
    w.close()
    w.close()  # idempotent
    with pytest.raises(zerr.Lz4Error):
        w.write(b"more")


def test_reader_after_close():
    comp = plz4.compress(b"payload")
    r = plz4.Reader(io.BytesIO(comp))
    r.read(3)
    r.close()
    with pytest.raises(zerr.Lz4Error):
        r.read(1)


def test_concatenated_frames():
    c1 = plz4.compress(b"first frame ")
    c2 = plz4.compress(b"second frame", level=6)
    c3 = plz4.compress(b"")
    assert plz4.decompress(c1 + c2 + c3) == b"first frame second frame"


def test_skip_frame_roundtrip():
    out = io.BytesIO()
    plz4.write_skip_frame_header(out, 0xA, 5)
    out.write(b"metaX")
    w = plz4.Writer(out)
    w.write(b"payload")
    w.close()

    seen = []

    def cb(rd, nibble, size):
        seen.append((nibble, rd.read(size)))

    r = plz4.Reader(io.BytesIO(out.getvalue()), skip_callback=cb)
    assert r.read() == b"payload"
    assert seen == [(0xA, b"metaX")]


def test_writer_skip_frame_method():
    out = io.BytesIO()
    w = plz4.Writer(out)
    w.write_skip_frame(3, b"hello-meta")
    w.write(b"payload")
    w.close()
    assert plz4.decompress(out.getvalue()) == b"payload"
    # not legal once frame data started
    out2 = io.BytesIO()
    w2 = plz4.Writer(out2)
    w2.write(b"x" * 100)
    w2.flush()
    with pytest.raises(zerr.Lz4Error):
        w2.write_skip_frame(1, b"late")
    w2.close()


def test_writer_skip_frame_rejected_with_staged_data():
    """Regression: staged-but-unflushed data counts as 'frame started' —
    a skip frame emitted then would be reordered ahead of the write."""
    out = io.BytesIO()
    w = plz4.Writer(out)
    w.write(b"abc")  # stays in the stage buffer (below one block)
    with pytest.raises(zerr.Lz4Error):
        w.write_skip_frame(1, b"late")
    w.close()
    assert plz4.decompress(out.getvalue()) == b"abc"


def test_writer_accepts_non_uint8_buffers():
    """Regression: non-uint8 buffers are measured in BYTES (an 'I'-typed
    array previously produced oversized blocks / wrong content_size)."""
    import array

    payload = array.array("I", list(range(50000)))
    out = io.BytesIO()
    w = plz4.Writer(out, block_size_idx=4, content_size=len(
        payload.tobytes()))
    w.write(payload)
    w.close()
    assert plz4.decompress(out.getvalue()) == payload.tobytes()


def test_compress_block_undersized_dst_raises():
    with pytest.raises(zerr.Lz4Error):
        plz4.compress_block(b"hello world " * 500, dst=bytearray(4))


def test_skip_frame_between_frames():
    out = io.BytesIO()
    out.write(plz4.compress(b"AAA "))
    plz4.write_skip_frame_header(out, 0, 3)
    out.write(b"xyz")
    out.write(plz4.compress(b"BBB"))
    assert plz4.decompress(out.getvalue()) == b"AAA BBB"


# --- dictionaries ----------------------------------------------------------


def test_dictionary_roundtrip():
    dict_ = make_incompressible(8192, seed=77)
    data = dict_[-4000:] + dict_[:2000]
    comp = plz4.compress(data, dictionary=dict_, content_checksum=False)
    comp_nodict = plz4.compress(data, content_checksum=False)
    assert len(comp) < len(comp_nodict)
    assert plz4.decompress(comp, dictionary=dict_) == data


def test_dictionary_wrong_fails():
    dict_ = make_incompressible(8192, seed=77)
    data = dict_[-4000:]
    comp = plz4.compress(data, dictionary=dict_)
    wrong = make_incompressible(8192, seed=78)
    with pytest.raises(zerr.Lz4Error):
        out = plz4.decompress(comp, dictionary=wrong)
        if out != data:  # either error or checksum mismatch is acceptable
            raise zerr.ErrContentHash


def test_dictionary_missing_fails():
    dict_ = make_incompressible(8192, seed=77)
    data = dict_[-4000:]
    comp = plz4.compress(data, dictionary=dict_)
    with pytest.raises(zerr.Lz4Error):
        out = plz4.decompress(comp)
        if out != data:
            raise zerr.ErrContentHash


def test_dict_id_and_callback():
    dict_ = make_incompressible(4096, seed=9)
    data = dict_[-2000:] + b"suffix"
    comp = plz4.compress(data, dictionary=dict_, dict_id=1234,
                         content_checksum=False)

    seen = []

    def dict_cb(dict_id):
        seen.append(dict_id)
        return dict_ if dict_id == 1234 else None

    out = plz4.decompress(comp, dict_callback=dict_cb)
    assert out == data
    assert seen == [1234]


def test_linked_blocks_cross_block_matches():
    # data where block N matches block N-1 heavily: linked mode must win
    base = make_incompressible(60000, seed=5)
    data = base + base[:30000] + base[30000:] + base
    comp_linked = plz4.compress(
        data, block_linked=True, block_size_idx=desc.BLOCK_IDX_64KB,
        content_checksum=False)
    comp_indep = plz4.compress(
        data, block_size_idx=desc.BLOCK_IDX_64KB, content_checksum=False)
    assert len(comp_linked) < len(comp_indep)
    assert plz4.decompress(comp_linked) == data


def test_linked_with_initial_dict():
    dict_ = make_incompressible(30000, seed=6)
    data = dict_[-20000:] + make_compressible(100000, seed=7)
    comp = plz4.compress(
        data, block_linked=True, dictionary=dict_,
        block_size_idx=desc.BLOCK_IDX_64KB, content_checksum=False)
    assert plz4.decompress(comp, dictionary=dict_) == data


# --- random access ---------------------------------------------------------


def test_read_offset_random_access():
    offsets = []  # (src_off, dst_pos) pairs from progress callback

    def progress(src_off, dst_pos):
        offsets.append((src_off, dst_pos))

    out = io.BytesIO()
    w = plz4.Writer(out, block_size_idx=desc.BLOCK_IDX_64KB,
                    progress=progress, content_checksum=False)
    w.write(PAYLOAD)
    w.close()
    comp = out.getvalue()

    # progress gives the dst position *after* each block; to re-enter at
    # block k, seek to the position after block k-1... which is where
    # block k starts.
    assert len(offsets) >= 3
    for (src_off, dst_pos) in offsets[:-1]:
        r = plz4.Reader(io.BytesIO(comp), read_offset=dst_pos)
        rest = r.read()
        assert rest == PAYLOAD[src_off:]
        r.close()


def test_read_offset_non_seekable():
    comp = plz4.compress(PAYLOAD, block_size_idx=desc.BLOCK_IDX_64KB,
                         content_checksum=False)

    class NoSeek:
        def __init__(self, b):
            self._b = io.BytesIO(b)

        def read(self, n=-1):
            return self._b.read(n)

    hdr_size = 7
    r = plz4.Reader(NoSeek(comp), read_offset=hdr_size)
    assert r.read() == PAYLOAD


def test_read_offset_rejects_linked():
    comp = plz4.compress(PAYLOAD, block_linked=True,
                         block_size_idx=desc.BLOCK_IDX_64KB)
    with pytest.raises(zerr.Lz4Error) as ei:
        plz4.Reader(io.BytesIO(comp), read_offset=100).read(1)
    assert ei.value is zerr.ErrReadOffsetLinked


def test_read_offset_too_small():
    comp = plz4.compress(PAYLOAD)
    with pytest.raises(zerr.Lz4Error):
        plz4.Reader(io.BytesIO(comp), read_offset=2).read(1)


# --- progress + metadata ---------------------------------------------------


def test_progress_maps_match():
    w_prog, r_prog = [], []
    out = io.BytesIO()
    w = plz4.Writer(out, block_size_idx=desc.BLOCK_IDX_64KB,
                    progress=lambda s, d: w_prog.append((s, d)))
    w.write(PAYLOAD)
    w.close()
    r = plz4.Reader(io.BytesIO(out.getvalue()),
                    progress=lambda s, d: r_prog.append((d, s)))
    r.read()
    # writer reports (src_off, dst_pos); reader reports (src_pos, dst_pos).
    # Block boundaries must correspond: same number of blocks, same source
    # offsets.
    assert len(w_prog) == len(r_prog)
    assert [s for s, _ in w_prog] == [d for d, _ in r_prog]


def test_content_size_validation():
    comp = plz4.compress(PAYLOAD, content_size=len(PAYLOAD))
    assert plz4.decompress(comp) == PAYLOAD
    # writer must reject mismatched declared size at close
    out = io.BytesIO()
    w = plz4.Writer(out, content_size=999)
    w.write(b"short")
    with pytest.raises(zerr.Lz4Error):
        w.close()


def test_content_size_check_on_read():
    comp = bytearray(plz4.compress(b"x" * 100, content_size=100,
                                   content_checksum=False))
    # corrupt the declared content size field (bytes 6..14 of header)
    comp[6] ^= 1
    # fix the header checksum so only the size mismatches
    from plz4_tpu.xxh32 import xxh32
    comp[14] = (xxh32(bytes(comp[4:14])) >> 8) & 0xFF
    with pytest.raises(zerr.Lz4Error):
        plz4.decompress(bytes(comp))
    # and with the check disabled it passes
    assert plz4.decompress(bytes(comp), content_size_check=False) == b"x" * 100


# --- corruption and truncation at the frame level -------------------------


def test_content_checksum_detects_corruption():
    comp = bytearray(plz4.compress(PAYLOAD[:100_000]))
    # flip a bit inside some data block (past the 7-byte header + size word)
    comp[500] ^= 0x10
    with pytest.raises(zerr.Lz4Error):
        plz4.decompress(bytes(comp))


def test_block_checksum_detects_corruption():
    comp = bytearray(plz4.compress(PAYLOAD[:100_000], block_checksum=True,
                                   content_checksum=False))
    comp[500] ^= 0x10
    with pytest.raises(zerr.Lz4Error) as ei:
        plz4.decompress(bytes(comp))
    assert zerr.is_corrupted(ei.value)


def test_truncation_mid_stream():
    comp = plz4.compress(PAYLOAD[:100_000])
    for cut in (8, 100, len(comp) // 2, len(comp) - 1):
        with pytest.raises(zerr.Lz4Error):
            plz4.decompress(comp[:cut])


def test_raw_block_api():
    data = make_compressible(10_000, seed=1)
    comp = plz4.compress_block(data, level=6)
    assert len(comp) <= plz4.compress_block_bound(len(data))
    assert plz4.decompress_block(comp, dst_size=len(data)) == data
    # size-guessing path
    assert plz4.decompress_block(comp) == data


def test_raw_block_api_dict():
    dict_ = make_incompressible(4096, seed=3)
    data = dict_[-1000:]
    comp = plz4.compress_block(data, dictionary=dict_)
    assert plz4.decompress_block(comp, dictionary=dict_,
                                 dst_size=len(data)) == data


def test_level_clamping():
    # out-of-range levels clamp, not error (reference: plz4_opts.go:140-146)
    comp = plz4.compress(b"data" * 100, level=99)
    assert plz4.decompress(comp) == b"data" * 100
    comp = plz4.compress(b"data" * 100, level=-5)
    assert plz4.decompress(comp) == b"data" * 100


def test_interspersed_write_and_read_from():
    """Mixing Write and ReadFrom on one writer (reference:
    wr_test.go:662-725)."""
    out = io.BytesIO()
    w = plz4.Writer(out, parallel=2, block_size_idx=desc.BLOCK_IDX_64KB)
    expect = bytearray()
    for i in range(6):
        part = make_compressible(30_000 + i * 1000, seed=200 + i)
        expect += part
        if i % 2 == 0:
            w.write(part)
        else:
            w.read_from(io.BytesIO(part))
    w.close()
    assert plz4.decompress(out.getvalue()) == bytes(expect)


def test_random_chunk_direct_writes():
    """Randomly sized writes spanning the no-copy direct-block path and the
    staging path (reference: wr_test.go:172-200)."""
    import numpy as np

    rng = np.random.default_rng(31)
    data = make_compressible(700_000, seed=30)
    out = io.BytesIO()
    w = plz4.Writer(out, parallel=2, block_size_idx=desc.BLOCK_IDX_64KB)
    i = 0
    while i < len(data):
        n = int(rng.integers(1, 200_000))
        w.write(data[i : i + n])
        i += n
    w.close()
    assert plz4.decompress(out.getvalue()) == data


def test_write_returns_consumed_count():
    out = io.BytesIO()
    w = plz4.Writer(out)
    assert w.write(b"abc") == 3
    assert w.write(b"") == 0
    w.close()
