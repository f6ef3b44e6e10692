import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage as ndi

from boxsegliver_tpu.ops import image_ops, array_kits


def test_zscore_matches_numpy_twin():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 1000, (32, 32)).astype(np.float32)
    img[img < 300] = 0
    out_dev = np.asarray(image_ops.zscore(jnp.asarray(img)))
    out_host = array_kits.zscore(img)
    np.testing.assert_allclose(out_dev, out_host, atol=1e-3)


def test_adjust_window_width_level():
    img = jnp.asarray([[-500.0, -250.0, 25.0, 300.0, 1000.0]])
    out = image_ops.adjust_window_width_level(img, 550, 25)
    np.testing.assert_allclose(np.asarray(out[0]),
                               [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)


def test_random_flip_deterministic_and_joint():
    key = jax.random.PRNGKey(0)
    img = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    lab = jnp.arange(16, dtype=jnp.int32).reshape(4, 4)
    out_img, out_lab = image_ops.random_flip(key, img, lab, flip=3)
    # image and label flipped jointly
    np.testing.assert_array_equal(np.asarray(out_img[..., 0]).astype(np.int32),
                                  np.asarray(out_lab))
    # deterministic for a given key
    out_img2, _ = image_ops.random_flip(key, img, lab, flip=3)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(out_img2))


def test_random_noise_bounds():
    key = jax.random.PRNGKey(1)
    img = jnp.zeros((16, 16))
    out = image_ops.random_noise(key, img, 0.05)
    assert float(jnp.max(jnp.abs(out))) <= 0.05 + 1e-6


def test_random_zoom_in_shapes_and_identity_scale():
    key = jax.random.PRNGKey(2)
    img = jnp.asarray(np.random.RandomState(0).rand(32, 32, 3), jnp.float32)
    lab = jnp.asarray(np.random.RandomState(1).randint(0, 3, (32, 32)), jnp.int32)
    out_img, out_lab = image_ops.random_zoom_in(key, img, lab, max_scale=1.4)
    assert out_img.shape == (32, 32, 3)
    assert out_lab.shape == (32, 32)
    # max_scale -> 1 means identity
    out_img2, out_lab2 = image_ops.random_zoom_in(key, img, lab, max_scale=1.0 + 1e-9)
    np.testing.assert_allclose(np.asarray(out_img2), np.asarray(img), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_lab2), np.asarray(lab))


def test_crop_and_resize_identity():
    img = jnp.asarray(np.random.RandomState(3).rand(16, 16, 1), jnp.float32)
    lab = jnp.asarray(np.random.RandomState(4).randint(0, 2, (16, 16)), jnp.int32)
    out_img, out_lab = image_ops.crop_and_resize_2d(img, lab, 0.0, 0.0, 16.0, 16.0, 16, 16)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_lab), np.asarray(lab))


def test_binary_dilation_matches_scipy():
    rng = np.random.RandomState(5)
    x = (rng.rand(1, 20, 20) > 0.8).astype(np.float32)
    for conn in (1, 2):
        got = np.asarray(image_ops.binary_dilation2d(jnp.asarray(x), connection=conn))
        struct = ndi.generate_binary_structure(2, conn)
        want = ndi.binary_dilation(x[0] > 0, structure=struct).astype(np.float32)
        np.testing.assert_array_equal(got[0], want)


def test_distance_transform_cityblock_matches_scipy():
    rng = np.random.RandomState(6)
    mask = (rng.rand(24, 24) > 0.1).astype(np.float32)
    mask[0, 0] = 0  # ensure at least one zero
    got = np.asarray(image_ops.distance_transform_cityblock(jnp.asarray(mask)))
    want = ndi.distance_transform_cdt(mask > 0, metric="taxicab").astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_augment_gamma_range_preserved():
    key = jax.random.PRNGKey(7)
    img = jnp.asarray(np.random.RandomState(8).rand(16, 16), jnp.float32)
    out = image_ops.augment_gamma(key, img, (0.7, 1.5))
    assert float(jnp.min(out)) >= float(jnp.min(img)) - 1e-5
    assert float(jnp.max(out)) <= float(jnp.max(img)) + 1e-5
