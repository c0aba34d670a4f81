"""The fine-window Pallas kernel (_fine_window_pallas, interpret mode)
must reproduce the XLA hybrid-search tail: first-O equal-low slot
extraction over [lo, hi) inside a 3-sub-tile window — and the full
packed vote path must give identical results through either backend."""

import numpy as np
import jax.numpy as jnp

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import build_fine_index, build_index
from bucketmap_tpu.ops.vote import FineLocator, _fine_window_pallas
from bucketmap_tpu.sim.simulator import ShortReadSimulator, random_genome
from bucketmap_tpu.io.fasta import FastaRecord


def _oracle(ftf, frow, lo_rel, hi_rel, low, O, low_bits, W=3):
    R = len(frow)
    out = np.full((R, O), 0xFFFFFFFF, np.uint32)
    mask = (1 << low_bits) - 1
    for r in range(R):
        win = ftf[frow[r] : frow[r] + W].reshape(-1)
        hits = [v for i, v in enumerate(win)
                if lo_rel[r] <= i < hi_rel[r] and int(v & mask) == low[r]]
        for o, v in enumerate(hits[:O]):
            out[r, o] = v
    return out


def test_fine_window_kernel_oracle():
    rng = np.random.default_rng(7)
    low_bits, O, W = 12, 8, 3
    NT, R = 64, 73                      # odd R exercises padding
    # sorted-low windows: every tile row ascending so any [lo, hi) slice
    # has contiguous equal runs, as the real table guarantees
    ftf = np.sort(
        rng.integers(0, 1 << low_bits, (NT // 8, 8 * 128)).astype(np.uint32),
        axis=1).reshape(NT, 128)
    ftf |= rng.integers(0, 1 << 10, (NT, 128)).astype(np.uint32) << 12
    frow = rng.integers(0, NT - W, R).astype(np.int32)
    lo = rng.integers(0, 256, R).astype(np.int32)
    hi = np.minimum(lo + rng.integers(0, 200, R), W * 128).astype(np.int32)
    lo[0], hi[0] = 5, 5                 # empty interval
    # make several rows query a low value that actually occurs
    flat = ftf.reshape(-1)
    low = rng.integers(0, 1 << low_bits, R).astype(np.int32)
    for r in range(1, R, 2):
        seg = flat[frow[r] * 128 + lo[r] : frow[r] * 128 + hi[r]]
        if len(seg):
            low[r] = int(seg[len(seg) // 2] & ((1 << low_bits) - 1))
    got = np.asarray(_fine_window_pallas(
        jnp.asarray(ftf), jnp.asarray(frow), jnp.asarray(lo),
        jnp.asarray(hi), jnp.asarray(low), O, low_bits, interpret=True))
    want = _oracle(ftf, frow, lo, hi, low, O, low_bits)
    np.testing.assert_array_equal(got, want)


def _retile(fp2):
    """Host 2-D fine_packed -> the device build's (n, Tp, 128) layout."""
    n, lpos = fp2.shape
    Tp = -(-(-(-lpos // 128) + 2) // 8) * 8
    out = np.full((n, Tp * 128), 0xFFFFFFFF, np.uint32)
    out[:, :lpos] = fp2
    return out.reshape(n, Tp, 128)


def test_packed_vote_pallas_finewin_matches_jnp():
    """End-to-end packed vote on a tandem-repeat genome: tiled table +
    Pallas window kernel (interpret) == tiled table + XLA gather ==
    legacy 2-D path."""
    rng = np.random.default_rng(31)
    unit = rng.integers(0, 4, 37).astype(np.uint8)
    tandem = np.tile(unit, 200)[: 2 * 2048]
    rest = rng.integers(0, 4, 5 * 2048).astype(np.uint8)
    genome = [FastaRecord("rep", np.concatenate([tandem, rest]))]
    cfg = MapperConfig(bucket_len=2048, read_len=150, query_seed=12,
                       locator_samples=10)
    index = build_index(genome, cfg)
    build_fine_index(index, keep_unpacked=True)

    n = 48
    codes = np.zeros((n, cfg.read_len), np.uint8)
    quals = np.full((n, cfg.read_len), 36, np.uint8)
    seg_len = np.full(n, cfg.read_len, np.int32)
    all_codes = genome[0].codes
    starts = rng.integers(0, len(all_codes) - cfg.read_len, n)
    for i, s in enumerate(starts):
        codes[i] = all_codes[s : s + cfg.read_len]
    bucket_ids = (starts // cfg.bucket_len).astype(np.int32)
    is_rc = rng.random(n) < 0.5

    tiled = _retile(np.asarray(index.fine_packed))
    outs = {}
    for mode in ("jnp", "pallas"):
        fl = FineLocator(index)
        fl.fine_packed = jnp.asarray(tiled)
        fl.search_steps = index.fine_search_steps
        fl._finewin_mode = mode
        fl._tally_interpret = True
        samp_hash, samp_idx = fl.prepare(codes, quals, seg_len)
        outs[mode] = fl.vote(bucket_ids, is_rc, samp_hash, samp_idx, seg_len)
    fl2 = FineLocator(index)            # legacy 2-D packed table
    samp_hash, samp_idx = fl2.prepare(codes, quals, seg_len)
    outs["flat"] = fl2.vote(bucket_ids, is_rc, samp_hash, samp_idx, seg_len)

    for name in ("pallas", "flat"):
        for a, b, what in zip(outs["jnp"], outs[name],
                              ("offset", "votes", "accept")):
            np.testing.assert_array_equal(
                a, b, err_msg=f"jnp vs {name}: {what}")
    # tandem-region reads often miss min_vote; the parity checks above
    # are the point — just require a meaningful accepted population
    assert outs["jnp"][2].sum() >= n * 0.5
