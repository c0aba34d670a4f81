"""Microbenchmark the coarse-stage formulations at production scale.

Builds a fake index (random bits, real shapes: G x w uint32 for a
1.7 Gbp genome -> ~26k buckets) and times:
  A. the shipping bit-sliced counter loop (ops/coarse.py)
  B. presence-materialize + unpack-sum reduction
on the real TPU. Run: python experiments/profile_coarse.py [mbp] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.ops.encoding import kmer_hashes, revcomp_hash, window_quality_sums

MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 1700.0
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

cfg = MapperConfig()
N = int(MBP * 1e6) // cfg.bucket_len
w = (N + 31) // 32
G = 4**cfg.index_seed + 1
s = cfg.mapper_samples
k, q = cfg.query_seed, cfg.index_seed
g = k - q + 1
rng = np.random.default_rng(0)
print(f"N={N} buckets, w={w} words, G={G} rows, B={B} reads, s={s}, g={g}")

qgram_words = jnp.asarray(rng.integers(0, 2**32, (G, w), dtype=np.uint64).astype(np.uint32))
kmer_to_row = jnp.asarray(rng.integers(0, G, 4**k).astype(np.int32))
codes = jnp.asarray(rng.integers(0, 4, (B, cfg.read_len)).astype(np.uint8))
qbits = jnp.uint32(4**q - 1)


def sample_hashes(codes):
    kmers = kmer_hashes(codes, k, xp=jnp)
    samp = kmers[:, :: max(1, kmers.shape[1] // s)][:, :s]
    return jnp.stack([samp, revcomp_hash(samp, k, xp=jnp)], axis=1)  # (B,2,s)


def variant_bitplane(qgram_words, kmer_to_row, codes):
    both = sample_hashes(codes)
    n_planes = s.bit_length()
    planes = [jnp.zeros((B, 2, w), dtype=jnp.uint32) for _ in range(n_planes)]
    for s_i in range(s):
        h = both[:, :, s_i]
        presence = jnp.full((B, 2, w), 0xFFFFFFFF, dtype=jnp.uint32)
        for i in range(g):
            gram = (h >> jnp.uint32(2 * i)) & qbits
            presence = presence & qgram_words[kmer_to_row[gram]]
        carry = presence
        for j in range(n_planes):
            t = planes[j] & carry
            planes[j] = planes[j] ^ carry
            carry = t
    shifts8 = jnp.arange(8, dtype=jnp.uint8)
    hits = jnp.zeros((B, 2, w, 4, 8), dtype=jnp.int8)
    for j in range(n_planes):
        by = jax.lax.bitcast_convert_type(planes[j], jnp.uint8)
        bit = ((by[..., None] >> shifts8) & jnp.uint8(1)).astype(jnp.int8)
        hits = hits + (bit << j)
    return hits.reshape(B, 2, w * 32).max(axis=2)


def variant_unpack_sum(qgram_words, kmer_to_row, codes):
    both = sample_hashes(codes)
    shifts8 = jnp.arange(8, dtype=jnp.uint8)
    hits = jnp.zeros((B, 2, w, 4, 8), dtype=jnp.int8)
    for s_i in range(s):
        h = both[:, :, s_i]
        presence = jnp.full((B, 2, w), 0xFFFFFFFF, dtype=jnp.uint32)
        for i in range(g):
            gram = (h >> jnp.uint32(2 * i)) & qbits
            presence = presence & qgram_words[kmer_to_row[gram]]
        by = jax.lax.bitcast_convert_type(presence, jnp.uint8)
        hits = hits + ((by[..., None] >> shifts8) & jnp.uint8(1)).astype(jnp.int8)
    return hits.reshape(B, 2, w * 32).max(axis=2)


def bench(name, fn):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(qgram_words, kmer_to_row, codes))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(qgram_words, kmer_to_row, codes))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name}: {dt*1000:.1f} ms/batch -> {B/dt:,.0f} reads/s  "
          f"(checksum {int(np.asarray(out).astype(np.int64).sum())})")
    return dt


bench("A bit-plane loop   ", variant_bitplane)
bench("B unpack-sum       ", variant_unpack_sum)


def variant_gather_only(qgram_words, kmer_to_row, codes):
    """Isolate gather+AND cost: trivial word-sum reduction instead of
    per-bucket counting."""
    both = sample_hashes(codes)
    acc = jnp.zeros((B, 2, w), dtype=jnp.uint32)
    for s_i in range(s):
        h = both[:, :, s_i]
        presence = jnp.full((B, 2, w), 0xFFFFFFFF, dtype=jnp.uint32)
        for i in range(g):
            gram = (h >> jnp.uint32(2 * i)) & qbits
            presence = presence & qgram_words[kmer_to_row[gram]]
        acc = acc + presence
    return acc.sum(axis=2)


def variant_gather_8rows(qgram_words, kmer_to_row, codes):
    """All s*g rows gathered in ONE gather op (B,2,s*g,w), then AND/count."""
    both = sample_hashes(codes)
    grams = []
    for i in range(g):
        grams.append((both >> jnp.uint32(2 * i)) & qbits)
    grams = jnp.stack(grams, axis=-1)          # (B,2,s,g)
    rows = kmer_to_row[grams]
    allrows = qgram_words[rows]                # (B,2,s,g,w)
    presence = allrows[..., 0, :]
    for i in range(1, g):
        presence = presence & allrows[..., i, :]
    shifts8 = jnp.arange(8, dtype=jnp.uint8)
    by = jax.lax.bitcast_convert_type(presence, jnp.uint8)
    bits = ((by[..., None] >> shifts8) & jnp.uint8(1)).astype(jnp.int8)
    return bits.sum(axis=2).reshape(B, 2, w * 32).max(axis=2)


bench("C gather-only      ", variant_gather_only)
bench("D one-gather       ", variant_gather_8rows)


# Paired-gram index: row10[t] = row9[hi 9-gram of t] & row9[lo 9-gram of t].
# A k-mer (k=12) = AND of its 4 q-grams (q=9) = AND of TWO 10-gram rows
# (positions 0 and 2) -> half the gathers. Build cost: one pass on device.
q2 = q + 1
q2bits = jnp.uint32(4**q2 - 1)

def build_paired(qgram_words, kmer_to_row):
    t = jnp.arange(4**q2, dtype=jnp.uint32)
    hi = (t >> jnp.uint32(2)) & qbits     # 9-gram at position 0 (big-endian)
    lo = t & qbits                        # 9-gram at position 1
    return qgram_words[kmer_to_row[hi]] & qgram_words[kmer_to_row[lo]]

t0 = time.time()
paired = jax.block_until_ready(jax.jit(build_paired)(qgram_words, kmer_to_row))
print(f"paired 10-gram table built in {time.time()-t0:.2f}s, "
      f"{paired.nbytes/1e9:.2f} GB")

def variant_paired(paired, codes):
    both = sample_hashes(codes)
    n_planes = s.bit_length()
    planes = [jnp.zeros((B, 2, w), dtype=jnp.uint32) for _ in range(n_planes)]
    for s_i in range(s):
        h = both[:, :, s_i]
        presence = jnp.full((B, 2, w), 0xFFFFFFFF, dtype=jnp.uint32)
        for i in range(0, g, 2):          # positions 0 and 2
            gram2 = (h >> jnp.uint32(2 * i)) & q2bits
            presence = presence & paired[gram2]
        carry = presence
        for j in range(n_planes):
            tt = planes[j] & carry
            planes[j] = planes[j] ^ carry
            carry = tt
    shifts8 = jnp.arange(8, dtype=jnp.uint8)
    hits = jnp.zeros((B, 2, w, 4, 8), dtype=jnp.int8)
    for j in range(n_planes):
        by = jax.lax.bitcast_convert_type(planes[j], jnp.uint8)
        bit = ((by[..., None] >> shifts8) & jnp.uint8(1)).astype(jnp.int8)
        hits = hits + (bit << j)
    return hits.reshape(B, 2, w * 32).max(axis=2)

def bench1(name, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name}: {dt*1000:.1f} ms/batch -> {B/dt:,.0f} reads/s  "
          f"(checksum {int(np.asarray(out).astype(np.int64).sum())})")

bench1("E paired 10-gram   ", variant_paired, paired, codes)


def variant_paired_gather_only(paired, codes):
    both = sample_hashes(codes)
    acc = jnp.zeros((B, 2, w), dtype=jnp.uint32)
    for s_i in range(s):
        h = both[:, :, s_i]
        presence = jnp.full((B, 2, w), 0xFFFFFFFF, dtype=jnp.uint32)
        for i in range(0, g, 2):
            gram2 = (h >> jnp.uint32(2 * i)) & q2bits
            presence = presence & paired[gram2]
        acc = acc + presence
    return acc.sum(axis=2)

def variant_single_gather_only(qgram_words, kmer_to_row, codes):
    """ONE gather per sample (row of first gram only): pure row-fetch rate."""
    both = sample_hashes(codes)
    acc = jnp.zeros((B, 2, w), dtype=jnp.uint32)
    for s_i in range(s):
        h = both[:, :, s_i]
        gram = h & qbits
        acc = acc + qgram_words[kmer_to_row[gram]]
    return acc.sum(axis=2)

bench1("F paired gather-only", variant_paired_gather_only, paired, codes)
bench1("G single gather-only", variant_single_gather_only, qgram_words, kmer_to_row, codes)
