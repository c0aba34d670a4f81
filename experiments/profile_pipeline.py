"""Production-shaped throughput probe: N distinct batches dispatched
async (like BucketMapPipeline.locate_arrays), blocked at the end.
Run: python experiments/profile_pipeline.py [n_batches] [batch]
"""
import sys, time
sys.path.insert(0, ".")
import jax, numpy as np
from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.mapper.device_pipeline import DeviceMapper

NB = int(sys.argv[1]) if len(sys.argv) > 1 else 12
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
index = builder.load_index(".bench_cache", "idx_1700")
print("fine arrays:", {k: (getattr(index, k).shape if getattr(index, k) is not None else None)
      for k in ("fine_pos", "fine_ptab", "fine_low")},
      "steps", index.fine_search_steps)
batch = read_fastq(".bench_cache/reads_g1700m_r1000000.fastq")
dm = DeviceMapper(index, batch_size=B, pairs_per_read=4, vote_chunk=B)

def run(nb, tag):
    t0 = time.perf_counter()
    outs = []
    for i in range(nb):
        s = (i * B) % (1000000 - B)
        codes = batch.codes[s:s+B]
        quals = batch.quals[s:s+B]
        lens = np.minimum(batch.lengths[s:s+B], 300).astype(np.int32)
        outs.append(dm.step(codes, quals, lens))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"{tag}: {nb} batches x {B} in {dt:.2f}s -> {nb*B/dt:,.0f} reads/s "
          f"({dt/nb*1000:.0f} ms/batch)")
    return outs

run(2, "warmup")
outs = run(NB, "steady ")
acc = sum(int(np.asarray(o)[0]) for o in outs)  # hdr[0] = n_accept
print(f"accepted {acc} locations / {NB*B} reads")
