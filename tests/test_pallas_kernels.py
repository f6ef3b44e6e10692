"""Pallas kernel tests (interpret mode on the CPU mesh; the same kernel was
verified compiled-and-matching on the real TPU)."""

import jax.numpy as jnp
import numpy as np

from boxsegliver_tpu.ops.guides import gaussian_guide_2d
from boxsegliver_tpu.ops.pallas_kernels import gaussian_guide_batch


def test_pallas_guide_matches_jnp_reference():
    bs, K, H, W = 3, 8, 64, 64
    rng = np.random.default_rng(0)
    centers = rng.uniform(5, 59, (bs, K, 2)).astype(np.float32)
    stddevs = rng.uniform(2, 8, (bs, K, 2)).astype(np.float32)
    n_objs = np.array([0, 3, 8], np.int32)
    out = np.asarray(gaussian_guide_batch(
        jnp.asarray(centers), jnp.asarray(stddevs), jnp.asarray(n_objs),
        height=H, width=W, interpret=True))
    assert out.shape == (bs, H, W, 1)
    for b in range(bs):
        mask = jnp.arange(K) < n_objs[b]
        ref = np.asarray(gaussian_guide_2d((H, W), centers[b], stddevs[b],
                                           mask=mask))
        np.testing.assert_allclose(out[b], ref, atol=1e-5)
    # zero objects → all-zero guide
    assert out[0].max() == 0.0
