"""_first_set_indices (exact capped set-bit compaction — the TopK
replacement in candidate extraction) vs a numpy oracle, including
power-of-two lane counts (the lower-bound step-count edge case)."""

import numpy as np
import jax
import jax.numpy as jnp

from bucketmap_tpu.ops.coarse import _first_set_indices


def test_first_set_indices_matches_numpy():
    rng = np.random.RandomState(0)
    for (n, C) in [(8, 30), (96, 8), (200, 30), (128, 30), (896, 30)]:
        for density in (0.0, 0.02, 0.3, 0.9, 1.0):
            mask = rng.random_sample((50, n)) < density
            idx, valid = jax.device_get(
                _first_set_indices(jnp.asarray(mask), C))
            for r in range(50):
                want = np.nonzero(mask[r])[0][:C]
                got = idx[r][valid[r]]
                assert len(got) == min(len(want), C), (n, C, density, r)
                assert (got == want).all(), (n, C, density, r, want, got)
