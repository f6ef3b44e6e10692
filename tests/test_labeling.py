"""In-graph CC labeling / moments / Wu-ascent vs the host (scipy/numpy)
oracles used by the interactive guide-propagation state machine."""

import numpy as np
import pytest
from scipy import ndimage as ndi

import jax
import jax.numpy as jnp

from boxsegliver_tpu.ops import array_kits
from boxsegliver_tpu.ops.labeling import (label_components, object_moments,
                                          ordered_seeds, wu_ascent)


def _random_mask(rs, shape=(64, 64), n_blobs=5):
    mask = np.zeros(shape, np.uint8)
    for _ in range(n_blobs):
        cy, cx = rs.randint(4, shape[0] - 4), rs.randint(4, shape[1] - 4)
        ry, rx = rs.randint(1, 6), rs.randint(1, 6)
        yy, xx = np.ogrid[:shape[0], :shape[1]]
        mask |= (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0)
    return mask


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_label_components_matches_ndi(seed):
    rs = np.random.RandomState(seed)
    mask = _random_mask(rs)
    disc = ndi.generate_binary_structure(2, 1)
    ref_labels, n_ref = ndi.label(mask, disc)

    labels = np.asarray(label_components(jnp.asarray(mask > 0)))
    seeds, n = ordered_seeds(jnp.asarray(labels), max_objects=16)
    assert int(n) == n_ref
    # same partition, and label VALUES sort in ndi's component order
    seeds = np.asarray(seeds)[:n_ref]
    for i in range(n_ref):
        np.testing.assert_array_equal(labels == seeds[i], ref_labels == i + 1)


def test_label_components_snake():
    """Spiral stresses the multi-pass propagation to fixpoint."""
    mask = np.zeros((32, 32), np.uint8)
    mask[2, 2:30] = 1
    mask[2:30, 29] = 1
    mask[29, 5:30] = 1
    mask[8:30, 5] = 1
    mask[8, 5:24] = 1
    labels = np.asarray(label_components(jnp.asarray(mask > 0)))
    ref_labels, n = ndi.label(mask, ndi.generate_binary_structure(2, 1))
    assert n == 1
    assert (labels[mask > 0] == labels[mask > 0][0]).all()
    assert (labels[mask == 0] == 32 * 32).all()


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_object_moments_match_host(seed):
    rs = np.random.RandomState(seed)
    mask = _random_mask(rs)
    ref_labels, n = ndi.label(mask, ndi.generate_binary_structure(2, 1))
    k = 8
    labels = label_components(jnp.asarray(mask > 0))
    seeds, _ = ordered_seeds(labels, max_objects=k)
    seeds_np = np.asarray(seeds)[:, None, None]
    obj = (np.asarray(labels)[None] == seeds_np) & (seeds_np < 64 * 64)
    centers, stds = object_moments(jnp.asarray(obj), min_std=2.0)
    centers, stds = np.asarray(centers), np.asarray(stds)
    for i, sli in enumerate(ndi.find_objects(ref_labels)[:k]):
        full = ref_labels == i + 1
        c_ref, s_ref = array_kits.compute_robust_moments(
            full, indexing="ij", min_std=2.0)
        np.testing.assert_allclose(centers[i], c_ref, atol=1e-5)
        np.testing.assert_allclose(stds[i], s_ref, rtol=1e-6)
    for i in range(n, k):
        np.testing.assert_array_equal(centers[i], [-1.0, -1.0])


def test_wu_ascent_matches_host():
    rs = np.random.RandomState(3)
    # smooth guide-like image: sum of gaussians
    img = array_kits.create_gaussian_distribution_v2(
        (48, 48), [[10, 12], [30, 35], [25, 8]],
        [[4, 5], [6, 3], [3, 3]]).astype(np.float32) / 2 + 0.5
    peaks = rs.randint(0, 48, size=(20, 2))
    centers = rs.randint(0, 48, size=(12, 2))
    for p in peaks:
        ref = []
        for c in centers:
            if tuple(p) == tuple(c):
                ref.append(True)
            else:
                ref.append(array_kits.ascent_line(
                    img, int(p[1]), int(p[0]), int(c[1]), int(c[0])))
        got = np.asarray(wu_ascent(jnp.asarray(img),
                                   jnp.asarray(p, jnp.int32),
                                   jnp.asarray(centers, jnp.int32)))
        np.testing.assert_array_equal(got, np.asarray(ref), err_msg=str(p))


def test_wu_ascent_jits():
    img = jnp.ones((32, 32), jnp.float32)
    f = jax.jit(wu_ascent)
    out = f(img, jnp.asarray([5, 5], jnp.int32),
            jnp.asarray([[10, 20], [5, 5]], jnp.int32))
    assert bool(out[0]) and bool(out[1])
