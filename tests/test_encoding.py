import numpy as np
import pytest

from bucketmap_tpu.ops import encoding as enc
from bucketmap_tpu.ops.sampler import sample_deterministic, sample_table


def test_encode_decode_roundtrip():
    seq = b"ACGTACGTTTGCA"
    codes = enc.encode_ascii(seq)
    assert enc.decode_to_ascii(codes) == seq
    np.testing.assert_array_equal(codes[:4], [0, 1, 2, 3])


def test_n_maps_to_a():
    assert enc.encode_ascii(b"N")[0] == 0
    assert enc.encode_ascii(b"acgt").tolist() == [0, 1, 2, 3]


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    for n in [1, 15, 16, 17, 100, 333]:
        codes = rng.randint(0, 4, n).astype(np.uint8)
        words = enc.pack_2bit(codes)
        assert words.dtype == np.uint32
        assert len(words) == (n + 15) // 16
        out = enc.unpack_2bit(words, n)
        np.testing.assert_array_equal(out, codes)


@pytest.mark.parametrize("k", [2, 3, 9, 12, 14, 16])
def test_kmer_hashes_match_oracle(k):
    rng = np.random.RandomState(k)
    codes = rng.randint(0, 4, 200).astype(np.uint8)
    got = enc.kmer_hashes(codes, k)
    want = enc.kmer_hashes_ref(codes, k)
    assert got.shape == (200 - k + 1,)
    np.testing.assert_array_equal(got, want)


def test_kmer_hash_value_convention():
    # hash is big-endian base 4: ACGT -> 0*64 + 1*16 + 2*4 + 3
    codes = enc.encode_ascii(b"ACGT")
    assert enc.kmer_hashes(codes, 4)[0] == 0 * 64 + 1 * 16 + 2 * 4 + 3


def test_revcomp_hash_matches_sequence_revcomp():
    rng = np.random.RandomState(1)
    for k in [3, 9, 12]:
        codes = rng.randint(0, 4, k).astype(np.uint8)
        h = enc.kmer_hashes(codes, k)[0]
        rc = enc.revcomp_codes(codes)
        h_rc = enc.kmer_hashes(rc, k)[0]
        assert enc.revcomp_hash(np.uint32(h), k) == h_rc


def test_window_quality_sums():
    q = np.array([1, 2, 3, 4, 5], dtype=np.int32)
    np.testing.assert_array_equal(enc.window_quality_sums(q, 3), [6, 9, 12])
    # batched
    qb = np.stack([q, q * 2])
    out = enc.window_quality_sums(qb, 3)
    np.testing.assert_array_equal(out[1], [12, 18, 24])


def test_qgram_extraction():
    # k=4 over ACGT, q=2: q-grams at shifts 0,1,2 are GT(11), CG(6), AC(1)
    h = np.uint32(0 * 64 + 1 * 16 + 2 * 4 + 3)
    assert enc.qgram_of_kmer(h, 0, 2) == 11
    assert enc.qgram_of_kmer(h, 1, 2) == 6
    assert enc.qgram_of_kmer(h, 2, 2) == 1


def test_sampler_reference_semantics():
    # utils.h:160-178: delta = (ub+1)/(n-1); floor(i*delta); last = ub
    np.testing.assert_array_equal(sample_deterministic(1, 7), [7])
    np.testing.assert_array_equal(sample_deterministic(5, 9), [0, 2, 5, 7, 9])
    # double rounding case: ub+1=7, n-1=3 -> delta=2.333..; i=2 -> floor(4.666)=4
    np.testing.assert_array_equal(sample_deterministic(4, 6), [0, 2, 4, 6])
    # repeats when range smaller than n
    np.testing.assert_array_equal(sample_deterministic(5, 2), [0, 0, 1, 2, 2])


def test_sample_table():
    t = sample_table(10, 300)
    assert t.shape == (301, 10)
    np.testing.assert_array_equal(t[289], sample_deterministic(10, 289))


def test_kmer_hashes_jnp_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    codes = rng.randint(0, 4, 120).astype(np.uint8)
    got = np.asarray(enc.kmer_hashes(jnp.asarray(codes), 12, xp=jnp))
    np.testing.assert_array_equal(got, enc.kmer_hashes(codes, 12))
    h = enc.kmer_hashes(codes, 12)
    got_rc = np.asarray(enc.revcomp_hash(jnp.asarray(h), 12, xp=jnp))
    np.testing.assert_array_equal(got_rc, enc.revcomp_hash(h, 12))


def test_native_pack_reads_matches_numpy():
    """csrc/bmtpu_io.cpp:bmtpu_pack_reads is a bit-identical twin of
    encoding.pack_reads (the device transfer layout)."""
    import pytest

    from bucketmap_tpu.io import native
    from bucketmap_tpu.ops.encoding import pack_reads

    if not native.available():
        pytest.skip("native IO library unavailable")
    rng = np.random.default_rng(7)
    for B, L, k, mq in [(33, 300, 12, 300), (8, 50, 9, 0), (5, 128, 12, 64)]:
        codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
        quals = rng.integers(0, 42, (B, L), dtype=np.uint8)
        lengths = rng.integers(k, L + 1, B).astype(np.int64)
        col = np.arange(L)
        codes = np.where(col < lengths[:, None], codes, 0).astype(np.uint8)
        quals = np.where(col < lengths[:, None], quals, 0).astype(np.uint8)
        a = pack_reads(codes, quals, lengths, k, mq)
        b = native.pack_reads(codes, quals, lengths, k, mq)
        assert a.shape == b.shape and (a == b).all()

def _pack_ops(ops: np.ndarray) -> np.ndarray:
    """uint8 op codes -> (n, ow) uint32 rows, 16 codes/word LSB-first
    (the banded-DP traceback download layout, ops/align.py)."""
    n, m = ops.shape
    ow = -(-m // 16)
    padded = np.zeros((n, ow * 16), np.uint32)
    padded[:, :m] = ops
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    return (padded.reshape(n, ow, 16) << shifts).sum(axis=2).astype(np.uint32)


def test_native_cigar_rle_matches_python():
    """native.cigar_rle must agree with ops_to_cigar even when zero op
    codes appear MID-row (degenerate tracebacks crossing a dir=0 cell,
    kept because scores < -60 bypass the threshold) — the Python twin
    filters zeros anywhere, so the native path must too (ADVICE r3)."""
    import pytest

    from bucketmap_tpu.io import native
    from bucketmap_tpu.ops.align import ops_to_cigar

    if not native.available():
        pytest.skip("native IO library unavailable")
    rng = np.random.default_rng(11)
    max_ops = 40
    rows = []
    # random rows; force mid-row zeros into half of them
    for i in range(64):
        r = rng.integers(0, 4, max_ops).astype(np.uint8)
        if i % 2:
            z = rng.integers(0, max_ops, 5)
            r[z] = 0
        rows.append(r)
    rows.append(np.zeros(max_ops, np.uint8))        # all-pad row -> '*'
    ops = np.stack(rows)
    buf, offs = native.cigar_rle(_pack_ops(ops), max_ops)
    for i in range(len(ops)):
        got = buf[offs[i]:offs[i + 1]].decode() or "*"
        assert got == ops_to_cigar(ops[i]), f"row {i}"


def test_native_cigar_rle_long_reads():
    """Reads longer than ~4 kb (max_ops > 4096) must still RLE natively
    — the round-3 fixed stack buffer raised instead (ADVICE r3)."""
    import pytest

    from bucketmap_tpu.io import native
    from bucketmap_tpu.ops.align import ops_to_cigar

    if not native.available():
        pytest.skip("native IO library unavailable")
    rng = np.random.default_rng(13)
    max_ops = 8200  # ~8 kb ONT read + band pad
    ops = rng.integers(0, 4, (3, max_ops)).astype(np.uint8)
    res = native.cigar_rle(_pack_ops(ops), max_ops)
    assert res is not None
    buf, offs = res
    for i in range(len(ops)):
        got = buf[offs[i]:offs[i + 1]].decode() or "*"
        assert got == ops_to_cigar(ops[i]), f"row {i}"
