"""The Pallas sequential-tally kernel must equal the jnp fori_loop tally
(itself oracle-tested against a literal _find_offset port in
test_vote_oracle.py). Runs the kernel in interpreter mode so the test
works on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from bucketmap_tpu.config import MapperConfig
from bucketmap_tpu.index.builder import build_index
from bucketmap_tpu.ops.vote import FineLocator, _tally_pallas_call
from bucketmap_tpu.sim.simulator import random_genome


def _locator():
    cfg = MapperConfig(bucket_len=1024, read_len=300)
    index = build_index(random_genome(8 * 1024, seed=3), cfg)
    return cfg, FineLocator(index)


def _rand_case(rng, P, p, O, tandem: bool):
    prop = rng.randint(-300, 2000, (P, p, O)).astype(np.int32)
    occ_valid = rng.random_sample((P, p, O)) < 0.35
    occ_valid[:, :, 0] |= rng.random_sample((P, p)) < 0.9
    if tandem:
        # tandem-repeat shape: many near-identical proposals per sample
        # (votes can exceed p, creation-order matters)
        base = rng.randint(0, 1500, (P, 1, 1))
        jitter = rng.randint(-6, 7, (P, p, O))
        cl = rng.random_sample((P, p, O)) < 0.85
        prop = np.where(cl, base + jitter, prop).astype(np.int32)
    is_rc = rng.random_sample(P) < 0.5
    return prop, occ_valid, is_rc


def test_pallas_tally_matches_jnp():
    cfg, fl = _locator()
    rng = np.random.RandomState(11)
    p, O = cfg.locator_samples, FineLocator.MAX_OCC
    for tandem in (False, True):
        prop, occ_valid, is_rc = _rand_case(rng, 192, p, O, tandem)
        fl._tally_mode = "jnp"
        o1, v1, a1 = jax.device_get(
            fl._tally(jnp.asarray(prop), jnp.asarray(occ_valid),
                      jnp.asarray(is_rc)))
        fl._tally_mode, fl._tally_interpret = "pallas", True
        o2, v2, a2 = jax.device_get(
            fl._tally(jnp.asarray(prop), jnp.asarray(occ_valid),
                      jnp.asarray(is_rc)))
        fl._tally_mode, fl._tally_interpret = "jnp", False
        np.testing.assert_array_equal(a1, a2, err_msg=f"tandem={tandem}")
        # offset/votes are only meaningful on accepted lanes
        np.testing.assert_array_equal(np.where(a1, o1, 0), np.where(a2, o2, 0))
        np.testing.assert_array_equal(np.where(a1, v1, 0), np.where(a2, v2, 0))


def test_pallas_tally_row_padding():
    """P not a multiple of block_rows pads internally and slices back."""
    cfg, fl = _locator()
    rng = np.random.RandomState(5)
    p, O = cfg.locator_samples, FineLocator.MAX_OCC
    P = 70  # < block_rows and not a multiple of 8
    prop, occ_valid, is_rc = _rand_case(rng, P, p, O, True)
    fl._tally_mode = "jnp"
    o1, v1, a1 = jax.device_get(
        fl._tally(jnp.asarray(prop), jnp.asarray(occ_valid),
                  jnp.asarray(is_rc)))
    flat_p = np.where(is_rc[:, None, None], prop[:, ::-1, :], prop)
    flat_v = np.where(is_rc[:, None, None], occ_valid[:, ::-1, :], occ_valid)
    o2, v2, a2 = jax.device_get(_tally_pallas_call(
        jnp.asarray(flat_p.reshape(P, p * O)),
        jnp.asarray(flat_v.reshape(P, p * O).astype(np.int32)),
        p, O, cfg.allowed_indel, cfg.min_vote, cfg.read_len,
        block_rows=32, interpret=True))
    assert o2.shape == (P,)
    np.testing.assert_array_equal(a1, np.asarray(a2))
    np.testing.assert_array_equal(np.where(a1, o1, 0),
                                  np.where(np.asarray(a2), np.asarray(o2), 0))
    np.testing.assert_array_equal(np.where(a1, v1, 0),
                                  np.where(np.asarray(a2), np.asarray(v2), 0))
