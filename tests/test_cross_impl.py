"""Cross-implementation conformance: every encoder's output must decode
identically on every decoder (native C++, XLA array program, Pallas
interpret). This triangulation substitutes for lz4c-produced fixtures
(absent from the reference mount) — three independently-written codecs
agreeing on the same byte streams.

Also: decoder robustness fuzzing — arbitrary and mutated inputs must
produce an error or wrong output, never a crash/hang (the C++ decoder is
memory-safe by construction; these tests enforce it).
"""

import numpy as np
import pytest

from plz4_tpu import errors as zerr, native
from plz4_tpu.ops import decode_jax, decode_pallas, encode_jax, encode_pallas

from conftest import make_compressible, make_incompressible

CORPUS = [
    ("text", make_compressible(6000, seed=90)),
    ("zeros", b"\x00" * 4000),
    ("period5", (make_incompressible(5, seed=91) * 1000)[:5000]),
    ("mixed", make_compressible(2000, seed=92) + make_incompressible(500, seed=93)
     + b"Z" * 800),
]

ENCODERS = {
    "native-l1": lambda d: native.compress(d, level=1),
    "native-l9": lambda d: native.compress(d, level=9),
    "native-l12": lambda d: native.compress(d, level=12),
    "array": lambda d: encode_jax.encode_block_host(d) or d,
    "pallas": lambda d: encode_pallas.encode_block_host(d, interpret=True) or d,
}

DECODERS = {
    "native": lambda c, n: native.decompress(c, n),
    "array": lambda c, n: decode_jax.decode_block_host(c, out_cap=max(n, 16)),
    "pallas": lambda c, n: decode_pallas.decode_block_host(
        c, out_cap=max(n, 16), interpret=True),
}


@pytest.mark.parametrize("enc_name", sorted(ENCODERS))
@pytest.mark.parametrize("corpus_name,data", CORPUS,
                         ids=[c[0] for c in CORPUS])
def test_matrix(enc_name, corpus_name, data):
    comp = ENCODERS[enc_name](data)
    if comp == data:  # encoder flagged incompressible
        return
    for dec_name, dec in DECODERS.items():
        out = dec(comp, len(data))
        assert out == data, f"{enc_name} -> {dec_name} mismatch"


# --- decoder fuzz ----------------------------------------------------------


def test_fuzz_random_inputs_no_crash():
    rng = np.random.default_rng(0xF)
    for trial in range(200):
        n = int(rng.integers(1, 2000))
        junk = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            native.decompress(junk, 65536)
        except zerr.Lz4Error:
            pass


def test_fuzz_mutated_streams_no_crash():
    rng = np.random.default_rng(0xF2)
    data = make_compressible(8000, seed=94)
    comp = bytearray(native.compress(data, level=1))
    for trial in range(300):
        mutated = bytearray(comp)
        for _ in range(int(rng.integers(1, 8))):
            mutated[int(rng.integers(len(mutated)))] = int(rng.integers(256))
        try:
            out = native.decompress(bytes(mutated), len(data))
            assert len(out) <= len(data)
        except zerr.Lz4Error:
            pass


def test_fuzz_truncated_every_boundary():
    data = make_compressible(3000, seed=95)
    comp = native.compress(data, level=6)
    for cut in range(len(comp)):
        try:
            native.decompress(comp[:cut], len(data))
        except zerr.Lz4Error:
            pass


def test_fuzz_extension_byte_bombs():
    """Crafted 255-run bombs must not hang or overflow any decoder."""
    bombs = [
        bytes([0xF0]) + b"\xff" * 500 + b"\x01",           # huge literal len
        bytes([0x1F]) + b"x" + b"\x01\x00" + b"\xff" * 500 + b"\x01",
        b"\xff" * 100,                                      # tokens all 0xff
    ]
    for bomb in bombs:
        try:
            native.decompress(bomb, 65536)
        except zerr.Lz4Error:
            pass
        try:
            decode_jax.decode_block_host(bomb, out_cap=65536)
        except zerr.Lz4Error:
            pass
