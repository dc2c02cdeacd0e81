"""Fault injection: failing writers/readers at every Nth I/O call, error
latching, resource cleanup.

Reference test analog: failWriter/failReader sweeps (wr_test.go:852-1035,
rd_test.go:959-1074), badSeeker (rd_test.go:1629-1639), abort semantics.
"""

import io
import threading

import pytest

import plz4_tpu as plz4
from plz4_tpu import errors as zerr
from plz4_tpu.frame import descriptor as desc

from conftest import make_compressible

PAYLOAD = make_compressible(400_000, seed=13)


class FailWriter:
    """Raises on the Nth write call (reference: failWriter)."""

    def __init__(self, n):
        self.n = n
        self.calls = 0
        self.buf = io.BytesIO()

    def write(self, b):
        self.calls += 1
        if self.calls >= self.n:
            raise OSError(f"injected write failure at call {self.n}")
        return self.buf.write(b)


class FailReader:
    """Raises on the Nth read call (reference: failReader)."""

    def __init__(self, data, n):
        self.n = n
        self.calls = 0
        self.buf = io.BytesIO(data)

    def read(self, sz=-1):
        self.calls += 1
        if self.calls >= self.n:
            raise OSError(f"injected read failure at call {self.n}")
        return self.buf.read(sz)


def _max_write_calls() -> int:
    class Counter:
        def __init__(self):
            self.calls = 0
            self.buf = io.BytesIO()

        def write(self, b):
            self.calls += 1
            return self.buf.write(b)

    c = Counter()
    w = plz4.Writer(c, block_size_idx=desc.BLOCK_IDX_64KB, parallel=2)
    w.write(PAYLOAD)
    w.close()
    return c.calls


def test_writer_fail_sweep():
    """Every write-call index must surface the injected error exactly once
    and leave the writer safely closeable."""
    maxn = _max_write_calls()
    assert maxn > 5
    for n in range(1, maxn + 1):
        fw = FailWriter(n)
        w = plz4.Writer(fw, block_size_idx=desc.BLOCK_IDX_64KB, parallel=2)
        with pytest.raises(OSError):
            w.write(PAYLOAD)
            w.close()
        # after the error, close() must not raise again (latched + reported)
        w.close()
        # and writes must be rejected
        with pytest.raises((OSError, zerr.Lz4Error)):
            w.write(b"more")


def _max_read_calls(comp) -> int:
    class Counter:
        def __init__(self, data):
            self.calls = 0
            self.buf = io.BytesIO(data)

        def read(self, sz=-1):
            self.calls += 1
            return self.buf.read(sz)

    c = Counter(comp)
    r = plz4.Reader(c, parallel=2)
    r.read()
    r.close()
    return c.calls


def test_reader_fail_sweep():
    comp = plz4.compress(PAYLOAD, block_size_idx=desc.BLOCK_IDX_64KB,
                         block_checksum=True)
    maxn = _max_read_calls(comp)
    assert maxn > 5
    for n in range(1, maxn + 1):
        fr = FailReader(comp, n)
        r = plz4.Reader(fr, parallel=2)
        with pytest.raises(OSError):
            while True:
                b = r.read(65536)
                if not b:
                    break
        # error latched: same error on retry
        with pytest.raises(OSError):
            r.read(1)
        r.close()
        with pytest.raises(zerr.Lz4Error):
            r.read(1)  # closed


def test_bad_seeker():
    comp = plz4.compress(PAYLOAD, block_size_idx=desc.BLOCK_IDX_64KB,
                         content_checksum=False)

    class BadSeeker:
        def __init__(self, data):
            self.buf = io.BytesIO(data)

        def read(self, n=-1):
            return self.buf.read(n)

        def seek(self, off, whence=0):
            raise OSError("seek broken")

    # a failing seek must fall back to read-discard, not error
    r = plz4.Reader(BadSeeker(comp), read_offset=7)
    assert r.read() == PAYLOAD


def test_abort_mid_stream():
    """Closing a reader mid-stream must release its pool cleanly
    (reference: slow-consumer abort, rd_test.go:1180-1253)."""
    comp = plz4.compress(PAYLOAD, block_size_idx=desc.BLOCK_IDX_64KB)
    r = plz4.Reader(io.BytesIO(comp), parallel=4)
    r.read(1000)  # pipeline now has in-flight blocks
    r.close()
    # all worker threads must be gone
    for t in threading.enumerate():
        assert "plz4-decompress" not in t.name


def test_writer_abort_mid_stream():
    out = io.BytesIO()
    w = plz4.Writer(out, block_size_idx=desc.BLOCK_IDX_64KB, parallel=4)
    w.write(PAYLOAD)
    with w:  # context manager close
        pass
    for t in threading.enumerate():
        assert "plz4-compress" not in t.name


def test_no_thread_leak_after_many_cycles():
    before = threading.active_count()
    for _ in range(10):
        comp = plz4.compress(PAYLOAD[:100_000], parallel=3,
                             block_size_idx=desc.BLOCK_IDX_64KB)
        assert plz4.decompress(comp, parallel=3) == PAYLOAD[:100_000]
    assert threading.active_count() <= before + 1


def test_corrupted_vs_truncated_distinction():
    comp = plz4.compress(PAYLOAD[:100_000], block_checksum=True)
    # truncation: NOT corrupted-class
    try:
        plz4.decompress(comp[: len(comp) // 2])
        assert False
    except zerr.Lz4Error as e:
        assert not zerr.is_corrupted(e)
    # bit flip in block payload: corrupted-class (block checksum catches)
    mutated = bytearray(comp)
    mutated[50] ^= 0xFF
    try:
        plz4.decompress(bytes(mutated))
        assert False
    except zerr.Lz4Error as e:
        assert zerr.is_corrupted(e)


def test_deferred_error_after_partial_read():
    """When an error hits mid-read, already-decoded bytes are returned and
    the error surfaces on the next call (reference: rd_test.go:648-661)."""
    comp = bytearray(plz4.compress(PAYLOAD, block_size_idx=desc.BLOCK_IDX_64KB,
                                   block_checksum=True,
                                   content_checksum=False))
    # corrupt a late block's checksum so early blocks decode fine
    comp[-10] ^= 0xFF
    r = plz4.Reader(io.BytesIO(bytes(comp)), parallel=0)
    got = r.read(len(PAYLOAD))  # must return the early bytes, not raise
    assert 0 < len(got) < len(PAYLOAD)
    assert got == PAYLOAD[: len(got)]
    with pytest.raises(Exception):
        r.read(1)  # latched error surfaces now
