import numpy as np

from boxsegliver_tpu.ops import array_kits


def test_bbox_from_mask_2d():
    mask = np.zeros((10, 12), np.int32)
    mask[2:5, 3:9] = 1
    bbox = array_kits.bbox_from_mask(mask, 1)
    # (x1, y1, x2, y2) inclusive
    np.testing.assert_array_equal(bbox, [3, 2, 8, 4])
    sls = array_kits.bbox_to_slices(bbox)
    assert sls == (slice(2, 5), slice(3, 9))


def test_bbox_from_mask_3d_padding():
    mask = np.zeros((6, 10, 12), np.int32)
    mask[2:4, 3:5, 4:8] = 1
    bbox = array_kits.bbox_from_mask(mask, 1, padding=1)
    np.testing.assert_array_equal(bbox, [3, 2, 1, 8, 5, 4])


def test_extract_region_alignment():
    mask = np.zeros((64, 64), bool)
    mask[10:33, 20:41] = True
    bbox = array_kits.extract_region(mask, align=16)
    ndim = 2
    shape = bbox[ndim:] - bbox[:ndim] + 1
    assert np.all(shape % 16 == 0)
    # region must cover the mask
    assert bbox[0] <= 20 and bbox[1] <= 10 and bbox[2] >= 40 and bbox[3] >= 32


def test_get_largest_component():
    x = np.zeros((16, 16), np.int32)
    x[1:3, 1:3] = 1          # 4 px
    x[8:14, 8:14] = 1        # 36 px
    out = array_kits.get_largest_component(x, 2)
    assert out[10, 10] == 1 and out[1, 1] == 0


def test_merge_labels():
    x = np.array([[0, 1, 2], [2, 1, 0]])
    out = array_kits.merge_labels(x, [0, [1, 2]])
    np.testing.assert_array_equal(out, [[0, 1, 1], [1, 1, 0]])


def test_find_empty_slices():
    x = np.zeros((4, 8, 8))
    x[1, 2, 2] = 1
    out = array_kits.find_empty_slices(x)
    np.testing.assert_array_equal(out, [True, False, True, True])


def test_compute_robust_moments_center():
    mask = np.zeros((32, 32), np.int32)
    mask[10:21, 6:17] = 1
    c, s = array_kits.compute_robust_moments(mask)
    np.testing.assert_allclose(c, [15.0, 11.0])
    assert np.all(s > 0)
    cxy, _ = array_kits.compute_robust_moments(mask, indexing="xy")
    np.testing.assert_allclose(cxy, [11.0, 15.0])


def test_gd_image_single_obj_no_perturb():
    mask = np.zeros((32, 32), np.float32)
    mask[10:20, 10:20] = 1
    gd, c, s = array_kits.get_gd_image_single_obj(mask, 0.0, 0.0)
    assert gd.shape == (32, 32)
    assert gd.max() <= 1.0 + 1e-6
    # peak at the object center
    peak = np.unravel_index(np.argmax(gd), gd.shape)
    np.testing.assert_allclose(peak, c, atol=1.0)


def test_gd_image_multi_objs():
    mask = np.zeros((32, 32), np.float32)
    mask[2:8, 2:8] = 1
    mask[20:28, 20:28] = 1
    gd = array_kits.get_gd_image_multi_objs(mask, rng=np.random.RandomState(0))
    assert gd.shape == (32, 32)
    assert gd[4, 4] > 0.5 and gd[24, 24] > 0.5 and gd[4, 24] < 0.3


def test_get_moments_multi_objs_and_pad():
    mask = np.zeros((32, 32), np.float32)
    mask[2:8, 2:8] = 1
    mask[20:28, 20:28] = 1
    centers, stds = array_kits.get_moments_multi_objs(mask)
    assert len(centers) == 2
    c, s = array_kits.pad_moments(centers, stds, max_objs=4)
    assert c.shape == (4, 2)
    assert np.all(c[2:] == -1)


def test_gd_image_blank_prob_one():
    mask = np.ones((8, 8), np.float32)
    gd = array_kits.get_gd_image_single_obj(mask, blank_prob=1.0)
    np.testing.assert_allclose(gd, 0.0)
