import jax.numpy as jnp
import numpy as np

from boxsegliver_tpu.ops import array_kits, guides


def test_gaussian_guide_matches_numpy_v2():
    centers = np.array([[10.0, 20.0], [5.0, 5.0]], np.float32)
    stddevs = np.array([[3.0, 4.0], [2.0, 2.0]], np.float32)
    want = array_kits.create_gaussian_distribution_v2((32, 32), centers, stddevs,
                                                      indexing="ij", keepdims=True)
    got = np.asarray(guides.gaussian_guide_2d((32, 32), centers, stddevs))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_guide_padding_rows_ignored():
    centers = np.array([[10.0, 20.0], [-1.0, -1.0]], np.float32)
    stddevs = np.array([[3.0, 4.0], [-1.0, -1.0]], np.float32)
    got = np.asarray(guides.gaussian_guide_2d((32, 32), centers, stddevs))
    want = np.asarray(guides.gaussian_guide_2d((32, 32), centers[:1], stddevs[:1]))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gaussian_guide_all_padding_is_blank():
    centers = -np.ones((3, 2), np.float32)
    stddevs = -np.ones((3, 2), np.float32)
    got = np.asarray(guides.gaussian_guide_2d((8, 8), centers, stddevs))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_gaussian_guide_3d_matches_numpy():
    centers = np.array([[4.0, 8.0, 8.0]], np.float32)
    stddevs = np.array([[2.0, 3.0, 3.0]], np.float32)
    want = array_kits.create_gaussian_distribution_v2((8, 16, 16), centers, stddevs,
                                                      indexing="ij", keepdims=True)
    got = np.asarray(guides.gaussian_guide_3d((8, 16, 16), centers, stddevs))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_euclidean_guide():
    centers = np.array([[0.0, 0.0], [7.0, 7.0]], np.float32)
    got = np.asarray(guides.euclidean_guide((8, 8), centers, keepdims=False))
    np.testing.assert_allclose(got[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[7, 7], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[0, 7], 7.0, atol=1e-5)


def test_to_guided_range():
    g = jnp.asarray([[0.0, 1.0]])
    out = np.asarray(guides.to_guided_range(g))
    np.testing.assert_allclose(out, [[0.5, 1.0]])


def test_moments_from_mask_matches_host():
    rng = np.random.RandomState(0)
    mask = np.zeros((32, 32), np.float32)
    mask[8:20, 10:15] = 1
    mask[12, 3] = 1  # outlier — robust stats should shrug it off
    want_c, want_s = array_kits.compute_robust_moments(mask, indexing="ij")
    got_c, got_s = guides.moments_from_mask(jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_c), want_c, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), want_s, atol=1e-4)


def test_moments_from_mask_empty():
    got_c, got_s = guides.moments_from_mask(jnp.zeros((8, 8)))
    np.testing.assert_allclose(np.asarray(got_c), [-1.0, -1.0])
    np.testing.assert_allclose(np.asarray(got_s), [-1.0, -1.0])


def test_moments_min_std():
    mask = np.zeros((16, 16), np.float32)
    mask[5, 5] = 1  # single pixel → mad 0
    _, s = guides.moments_from_mask(jnp.asarray(mask), min_std=2.0)
    np.testing.assert_allclose(np.asarray(s), [2.0, 2.0])
