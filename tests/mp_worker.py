"""Worker for the 2-process distributed test (not a pytest module).

Usage: python tests/mp_worker.py <coordinator> <num_procs> <pid> <out_dir>

Each process: bootstrap the multi-process JAX runtime
(parallel.distributed.initialize), build the identical tiny world from
seeds, contribute its half of the read batch via global_read_batch, run
the bucket-sharded fused map step over the global (data x bucket) mesh,
all-gather the results and write its accepted-location set for the
parent to compare against the single-process result.
"""

import os
import sys

coordinator, num_procs, pid, out_dir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
os.environ["JAX_NUM_PROCESSES"] = str(num_procs)
os.environ["JAX_PROCESS_ID"] = str(pid)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from bucketmap_tpu.parallel import distributed  # noqa: E402

distributed.initialize()
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs     # 2 local CPU devices each

from tests.test_sharded_step import _reads, _world  # noqa: E402
from bucketmap_tpu.mapper.device_pipeline import DeviceMapper  # noqa: E402
from bucketmap_tpu.ops.encoding import pack_reads  # noqa: E402
from bucketmap_tpu.parallel.sharding import make_mesh  # noqa: E402

cfg, index, sim = _world()
B = 16
codes, quals, lengths, _ = _reads(sim, cfg, B)  # identical on all processes

mesh = make_mesh(len(jax.devices()), data=num_procs, bucket=2)
m = DeviceMapper(index, batch_size=B, pairs_per_read=16, vote_chunk=B,
                 mesh=mesh)

# each process contributes ITS OWN contiguous read rows
rows = slice(pid * B // num_procs, (pid + 1) * B // num_procs)
packed_local = pack_reads(codes[rows], quals[rows], lengths[rows],
                          cfg.query_seed, cfg.mapper_min_kmer_quality)
sharding = jax.sharding.NamedSharding(
    mesh, jax.sharding.PartitionSpec("data", None))
packed_global = jax.make_array_from_process_local_data(sharding, packed_local)

out = m.step_global(packed_global)
from jax.experimental import multihost_utils  # noqa: E402

vec = np.asarray(multihost_utils.process_allgather(out, tiled=True))
host = m.decode_out(vec)
accepted = sorted(zip(host["lane_read"].tolist(),
                      host["lane_bucket"].tolist(),
                      host["lane_rc"].astype(int).tolist(),
                      host["offset"].tolist(),
                      host["votes"].tolist()))
with open(os.path.join(out_dir, f"accepted_{pid}.txt"), "w") as f:
    for row in accepted:
        f.write(" ".join(str(int(v)) for v in row) + "\n")
print(f"[mp_worker {pid}] {len(accepted)} accepted OK", flush=True)
