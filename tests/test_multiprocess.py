"""Two REAL processes through parallel.distributed.initialize +
global_read_batch-style input assembly + the bucket-sharded map step,
checked for exact equality with the single-process result.

(The rest of the suite uses a single-process 8-device CPU mesh; this is
the only test that exercises jax.distributed's multi-process runtime.)
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_map(tmp_path):
    from tests.test_sharded_step import _accepted, _reads, _world
    from bucketmap_tpu.mapper.device_pipeline import DeviceMapper

    # expected: single-device result on the identical seeded world
    cfg, index, sim = _world()
    B = 16
    codes, quals, lengths, _ = _reads(sim, cfg, B)
    single = DeviceMapper(index, batch_size=B, pairs_per_read=16,
                          vote_chunk=B)
    expected = sorted(_accepted(single.decode_out(
        np.asarray(jax.device_get(single.step(codes, quals, lengths))))))

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "mp_worker.py"),
             f"127.0.0.1:{port}", "2", str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    for pid in range(2):
        got = [tuple(int(x) for x in l.split())
               for l in open(tmp_path / f"accepted_{pid}.txt")]
        want = [tuple(int(v) for v in row) for row in expected]
        assert got == want, f"worker {pid} result differs"
    assert len(expected) >= B * 0.8
