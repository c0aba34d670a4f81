"""Decompose the fused device step at production scale.

Loads the cached 1.7 Gbp bench index and times each sub-stage of
DeviceMapper._step_impl separately. Run after bench.py has populated
.bench_cache: python experiments/profile_step.py [batch]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bucketmap_tpu.index import builder
from bucketmap_tpu.io.fastq import read_fastq
from bucketmap_tpu.mapper.device_pipeline import DeviceMapper
from bucketmap_tpu.ops.encoding import pack_reads, unpack_reads

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
CACHE = ".bench_cache"
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

index = builder.load_index(CACHE, "idx_1700rep2")
print(f"index: {index.n_buckets} buckets, fine_pos "
      f"{None if index.fine_pos is None else index.fine_pos.shape}")

batch = read_fastq(f"{CACHE}/reads_g1700rep2m_r1000000.fastq")
codes = batch.codes[:B]
quals = batch.quals[:B]
lengths = np.minimum(batch.lengths[:B], index.config.read_len).astype(np.int32)

dm = DeviceMapper(index, batch_size=B, pairs_per_read=4, vote_chunk=B)
co, fi = dm.coarse, dm.fine
cfg = dm.cfg
C = cfg.max_candidate_buckets
P = dm.lane_budget

packed = pack_reads(codes, quals, lengths, cfg.query_seed,
                    cfg.mapper_min_kmer_quality)
jcodes, jqual_ok, jlens = jax.jit(
    lambda p: unpack_reads(p, cfg.read_len, cfg.query_seed, xp=jnp))(
        jnp.asarray(packed))


def _force(out):
    """block_until_ready doesn't actually block on the remote backend;
    a tiny dependent download does."""
    leaves = jax.tree_util.tree_leaves(out)
    probes = [l[(0,) * getattr(l, "ndim", 0)] for l in leaves]
    jax.device_get(probes)
    return out


def timeit(name, f, *args, n=3):
    out = _force(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)
    return out


# measure the forced-download floor (dispatch + tiny download latency)
_x = jnp.zeros(8)
timeit("0 latency floor    ", lambda v: v + 1, _x)


pres_fn = jax.jit(co._presence_impl)
presence, num_good, give_up = timeit("1 coarse presence  ", pres_fn,
                                     *co._index_args(), jcodes, jqual_ok,
                                     jlens)

# the fused scoring kernel (production path on TPU): sampling + rows +
# DMA-ring gather + counting + word reduce in one program
if co._scan_mode == "pallas" and co.qgram_words.shape[1] % 1024 == 0:
    from bucketmap_tpu.ops.coarse import _coarse_score_pallas

    def fused_score(qgram_words, kmer_to_row, dist_tab, sample_tab,
                    codes, qual_ok, lengths):
        cfgc = co.cfg
        both, num_good, give_up = co._sample_hashes_impl(
            kmer_to_row, dist_tab, sample_tab, codes, qual_ok, lengths)
        qbits = jnp.uint32(4**cfgc.index_seed - 1)
        shifts = 2 * jnp.arange(cfgc.qgrams_per_kmer, dtype=jnp.uint32)
        grams = (both[..., None] >> shifts) & qbits
        rows = kmer_to_row[grams].reshape(-1, cfgc.qgrams_per_kmer)
        w = qgram_words.shape[1]
        tab3 = qgram_words.reshape(qgram_words.shape[0], w // 128, 128)
        return _coarse_score_pallas(tab3, rows, jnp.int32(co.n_buckets),
                                    cfgc.mapper_samples)

    timeit("1f fused coarse    ", jax.jit(fused_score), *co._index_args(),
           jcodes, jqual_ok, jlens)

scan_fn = jax.jit(lambda p: co._chunk_scan(p, jnp.int32(co.n_buckets)))
chunk_max, chunk_cnt, planes = timeit("2 chunk scan       ", scan_fn, presence)


def select(planes, chunk_max, chunk_cnt, give_up):
    n = co.n_buckets
    max_hits = chunk_max.max(axis=2)
    ok = (max_hits >= cfg.min_coarse_hits) & ~give_up[:, None]
    counts = jnp.where((chunk_max == max_hits[:, :, None]) & ok[..., None],
                       chunk_cnt, 0).sum(axis=2)
    over = counts > C
    cand = co._extract_at_max2(planes, chunk_max, max_hits, ok & ~over, n)
    return cand, jnp.where(over, 0, counts)


cand, counts = timeit("2b candidate select", jax.jit(select), planes,
                      chunk_max, chunk_cnt, give_up)

prep_fn = jax.jit(fi._prepare_impl)
samp_hash, samp_idx = timeit("3 locator prepare  ", prep_fn, fi.sample_tab,
                             jcodes, jqual_ok, jlens)


@jax.jit
def compact(cand):
    flat = cand.reshape(-1)
    nl = flat.shape[0]
    lane = jnp.arange(nl, dtype=jnp.int32)
    key = jnp.where(flat >= 0, lane, nl)
    order = jnp.argsort(key)
    sel = order[:P]
    total_valid = (flat >= 0).sum().astype(jnp.int32)
    lane_read = sel // (2 * C)
    lane_rc = ((sel // C) % 2).astype(bool)
    lane_bucket = jnp.clip(flat[sel], 0, None).astype(jnp.int32)
    return lane_read, lane_rc, lane_bucket, total_valid


lane_read, lane_rc, lane_bucket, total_valid = timeit(
    "4 pair compaction  ", compact, cand)
print(f"   total_valid={int(total_valid)} of budget {P}")

# fine vote decomposition (packed production path): search+extract vs tally
vk = jax.jit(fi._vote_packed_impl)
timeit("5 fine vote (all)  ", vk, fi.fine_ptab, fi.fine_packed,
       lane_bucket[:B], lane_rc[:B], samp_hash[lane_read[:B]],
       samp_idx[lane_read[:B]], jlens[lane_read[:B]])


def search_only(fine_ptab, fine_packed, bucket_ids, is_rc, samp_hash,
                samp_idx, seg_len):
    from bucketmap_tpu.ops.encoding import revcomp_hash
    k, p = cfg.query_seed, cfg.locator_samples
    O = fi.MAX_OCC
    lpos = fine_packed.shape[1]
    low_bits = jnp.uint32(fi.low_bits)
    low_mask = jnp.uint32((1 << fi.low_bits) - 1)
    tgt_hash = jnp.where(is_rc[:, None],
                         revcomp_hash(samp_hash, k, xp=jnp), samp_hash)
    tgt_idx = jnp.where(is_rc[:, None],
                        seg_len[:, None] - k - samp_idx, samp_idx)
    prefix = (tgt_hash >> low_bits).astype(jnp.int32)
    low = (tgt_hash & low_mask).astype(jnp.int32)
    bid = bucket_ids[:, None]
    lo = fine_ptab[bid, prefix]
    seg_hi = fine_ptab[bid, prefix + 1]
    hi = seg_hi
    for _ in range(fi.search_steps):
        active = lo < hi
        mid = (lo + hi) // 2
        v = (fine_packed[bid, jnp.clip(mid, 0, lpos - 1)]
             & low_mask).astype(jnp.int32)
        below = active & (v < low)
        lo = jnp.where(below, mid + 1, lo)
        hi = jnp.where(active & ~below, mid, hi)
    occ_idx = lo[:, :, None] + jnp.arange(O, dtype=jnp.int32)
    occ_clamped = jnp.clip(occ_idx, 0, lpos - 1)
    pk = fine_packed[bid[:, :, None], occ_clamped]
    occ_low = (pk & low_mask).astype(jnp.int32)
    occ_valid = (occ_idx < seg_hi[:, :, None]) & (occ_low == low[:, :, None])
    occ_pos = jnp.where(occ_valid, (pk >> low_bits).astype(jnp.int32), 0)
    prop = occ_pos - tgt_idx[:, :, None]
    return prop, occ_valid


prop, occ_valid = timeit(
    "6 search+extract   ", jax.jit(search_only), fi.fine_ptab,
    fi.fine_packed, lane_bucket[:B], lane_rc[:B], samp_hash[lane_read[:B]],
    samp_idx[lane_read[:B]], jlens[lane_read[:B]])

timeit("7 tally (seq)      ", jax.jit(fi._tally), prop, occ_valid,
       lane_rc[:B])

full = timeit("8 FUSED step       ", dm.step, codes, quals, lengths)

t0 = time.perf_counter()
host = jax.device_get(full)
print(f"9 download          : {(time.perf_counter()-t0)*1000:.1f} ms "
      f"({sum(np.asarray(v).nbytes for v in host.values())/1e6:.1f} MB)")
