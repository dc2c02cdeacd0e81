"""Device-resident large-block throughput (two-k differencing): 1 MiB
blocks as 16-chunk rows through the chunked window-prefix encode and the
carry-record scan decode (parallel/large.py paths).

Run ON CHIP from /root/repo:  python tools/bench_large.py
Round-5 numbers (BASELINE.md): enc 37.9 MB/s (stride-2 preload),
dec 69.1 MB/s (byte-wide record kernel)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
import bench as benchmod
from plz4_tpu import native
from plz4_tpu.parallel import large as lg
from plz4_tpu.ops import decode_pallas as dp

CH = lg.CHUNK
corpus = benchmod.load_corpus()
M = 1 << 20
B, K = 2, M // CH
src = [corpus[i*M:(i+1)*M] for i in range(B)]
rows = np.stack([np.frombuffer(s, np.uint8).reshape(K, CH) for s in src])
lens = np.full((B, K), CH, np.int32)
d0 = np.zeros((B, CH), np.uint8)
dl0 = np.zeros((B,), np.int32)
ra, la, da, dla = map(jnp.asarray, (rows, lens, d0, dl0))

@functools.partial(jax.jit, static_argnames=("k",))
def enc_k(k):
    def body(i, acc):
        r2 = ra ^ (i % 7).astype(jnp.uint8)
        _, tot, _ = lg._encode_large_batch(r2, la, da, dla, 1)
        return (acc + jnp.sum(tot)) % (1 << 20)
    return jax.lax.fori_loop(0, k, body, jnp.int32(0))

def timed(f):
    t0 = time.perf_counter(); f(); return time.perf_counter() - t0

KK, KL = 16, 4
int(enc_k(KK)); int(enc_k(KL))
t_hi = min(timed(lambda: int(enc_k(KK))) for _ in range(3))
t_lo = min(timed(lambda: int(enc_k(KL))) for _ in range(3))
per = (t_hi - t_lo) / (KK - KL)
print(f"large-enc (chunked, window preload): {B*M/per/1e6:.1f} MB/s "
      f"({per*1e3:.1f} ms/batch)", flush=True)

# decode: split on host once, then two-k the scan
comp = [native.compress(s, level=1) for s in src]
recs = [native.chunk_split(c, CH, max_out=M) for c in comp]
Kd = max(len(r) for r in recs)
drows = np.zeros((B, Kd, lg.CHUNK_IN), np.uint8)
metas = np.zeros((B, Kd, 7), np.int32)
for b in range(B):
    ca = np.frombuffer(comp[b], np.uint8)
    for k2, r in enumerate(recs[b]):
        io_, il = int(r[0]), int(r[1])
        drows[b, k2, :il] = ca[io_:io_+il]
        metas[b, k2] = [il, CH if k2 else 0, r[2], r[3], r[4], r[5], r[6]]
w0 = np.zeros((B, CH), np.uint8)
dra, ma, wa = map(jnp.asarray, (drows, metas, w0))

@functools.partial(jax.jit, static_argnames=("k",))
def dec_k(k):
    def body(i, acc):
        _, ns, oks = dp.decode_chunks_batch_pallas(dra, ma, wa)
        return (acc + jnp.sum(ns) + i) % (1 << 20)
    return jax.lax.fori_loop(0, k, body, jnp.int32(0))

int(dec_k(KK)); int(dec_k(KL))
t_hi = min(timed(lambda: int(dec_k(KK))) for _ in range(3))
t_lo = min(timed(lambda: int(dec_k(KL))) for _ in range(3))
per = (t_hi - t_lo) / (KK - KL)
print(f"large-dec (record scan): {B*M/per/1e6:.1f} MB/s "
      f"({per*1e3:.1f} ms/batch)", flush=True)
# sanity
outs, ns, oks = dp.decode_chunks_batch_pallas(dra, ma, wa)
outs = np.asarray(outs)
for b in range(B):
    got = b"".join(outs[b, k2, :int(r[6])].tobytes()
                   for k2, r in enumerate(recs[b]))
    assert got == src[b], b
print("decode verified", flush=True)
