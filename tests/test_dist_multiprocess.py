"""True multi-process distributed correctness (reference analog: the
multi-host deployment SURVEY.md §5.8 describes — exercised for real with
2 and 4 controller processes + a coordinator on localhost, virtual CPU
devices forming an 8-device global mesh).

Verifies the multi-controller contract of parallel/batch.py: host batches
enter via per-process addressable shards (jax.make_array_from_callback)
and results return via process_allgather — `jax.device_get` on a global
array would throw on any non-addressable shard. The 4-process variant
runs a small option matrix including 256 KiB blocks (the chunked
large-block path, parallel/large.py) so the sharded (B, K, chunk) layout
is covered under multi-controller execution too.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys, hashlib

    coord, pid, nproc, ndev = (sys.argv[1], int(sys.argv[2]),
                               int(sys.argv[3]), int(sys.argv[4]))

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import plz4_tpu
    plz4_tpu.enable_compile_cache()
    from plz4_tpu.parallel import dist

    dist.init_distributed(coordinator_address=coord, num_processes=nproc,
                          process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * ndev, len(jax.devices())

    import numpy as np
    rng = np.random.default_rng(42)
    words = [bytes(rng.integers(97, 123, 8, dtype=np.uint8)) for _ in range(64)]
    data = b" ".join(words[int(rng.integers(64))] for _ in range(40000))

    # option matrix: plain 64 KiB; checksummed; 256 KiB blocks (the
    # chunked large-block path sharded across controllers)
    configs = [
        dict(block_size_idx=4, level=1, content_checksum=True),
        dict(block_size_idx=4, level=3, block_checksum=True,
             content_checksum=False),
        dict(block_size_idx=5, level=1, content_checksum=False),
    ]
    if nproc == 2:
        configs = configs[:1]  # the 2-process test is the fast smoke tier
    for ci, kw in enumerate(configs):
        comp = dist.compress_sharded(data, **kw)
        out = dist.decompress_sharded(comp)
        assert out == data, f"multi-process roundtrip mismatch (cfg {ci})"
        print(f"RESULT {pid} {ci} {hashlib.sha256(comp).hexdigest()} "
              f"{len(comp)}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_matrix(tmp_path, nproc: int, ndev: int, n_configs: int):
    port = _free_port()
    coord = f"localhost:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid), str(nproc),
             str(ndev)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(nproc)
    ]
    results: dict = {}
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
                _, rpid, ci, sha, clen = line.split()
                results.setdefault(int(ci), {})[int(rpid)] = (sha, clen)
    assert set(results) == set(range(n_configs)), results
    for ci, by_pid in results.items():
        assert set(by_pid) == set(range(nproc)), (ci, by_pid)
        # SPMD controllers must produce the identical compressed stream
        assert len(set(by_pid.values())) == 1, (ci, by_pid)


def test_two_process_mesh_roundtrip(tmp_path):
    _run_matrix(tmp_path, nproc=2, ndev=4, n_configs=1)


def test_four_process_matrix(tmp_path):
    """4 controllers x 2 devices = 8-device mesh; matrix incl. the
    large-block chunked path (VERDICT r4 next-#7)."""
    _run_matrix(tmp_path, nproc=4, ndev=2, n_configs=3)
