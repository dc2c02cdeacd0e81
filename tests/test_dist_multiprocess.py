"""True multi-process distributed correctness (reference analog: the
multi-host deployment SURVEY.md §5.8 describes — here exercised for real
with 2 controller processes + a coordinator on localhost, 4 virtual CPU
devices each = an 8-device global mesh).

Verifies the multi-controller contract of parallel/batch.py: host batches
enter via per-process addressable shards (jax.make_array_from_callback)
and results return via process_allgather — `jax.device_get` on a global
array would throw on any non-addressable shard.
"""

import hashlib
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys, hashlib

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])

    import plz4_tpu
    plz4_tpu.enable_compile_cache()
    from plz4_tpu.parallel import dist

    dist.init_distributed(coordinator_address=coord, num_processes=2,
                          process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np
    rng = np.random.default_rng(42)
    words = [bytes(rng.integers(97, 123, 8, dtype=np.uint8)) for _ in range(64)]
    data = b" ".join(words[int(rng.integers(64))] for _ in range(40000))

    comp = dist.compress_sharded(data, block_size_idx=4, level=1,
                                 content_checksum=True)
    out = dist.decompress_sharded(comp)
    assert out == data, "multi-process roundtrip mismatch"
    print(f"RESULT {pid} {hashlib.sha256(comp).hexdigest()} {len(comp)}",
          flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_roundtrip(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(pid)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    results = {}
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {pid} timed out")
        assert p.returncode == 0, (
            f"process {pid} failed:\nstdout:\n{out}\nstderr:\n{err[-4000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, rpid, sha, clen = line.split()
                results[int(rpid)] = (sha, clen)
    assert set(results) == {0, 1}, results
    # SPMD controllers must produce the identical compressed stream
    assert results[0] == results[1], results
