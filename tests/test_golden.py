"""Golden-parity tests against the reference's numpy semantics.

tests/fixtures/golden_ref.npz holds values produced by EXECUTING the
reference's own numpy code (utils/array_kits.py, utils/surface.py,
DataLoader/misc.py) on fixed inputs; these tests fail on any semantic drift
in our re-implementations (SURVEY.md §4 golden-test requirement).  Loss
goldens use in-test numpy oracles transcribing the reference TF1 formulas
(loss_metrics.py:114-231).  tests/fixtures/lits_k_folds.txt is the
reference's committed LiTS fold split (data/LiTS/k_folds.txt).
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from boxsegliver_tpu.ops import array_kits, losses, metrics3d
from boxsegliver_tpu.ops.glcm import glcm_features

FIX = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def g():
    return np.load(FIX / "golden_ref.npz")


# ---------------------------------------------------------------------------
# robust moments + gaussian guides (reference utils/array_kits.py:387-486)
# ---------------------------------------------------------------------------

def test_robust_moments_golden(g):
    mask2 = np.zeros((40, 48), np.uint8)
    mask2[10:25, 12:30] = 1
    mask2[15:20, 35:44] = 0
    c, s = array_kits.compute_robust_moments(mask2, indexing="ij", min_std=0.0)
    np.testing.assert_allclose(c, g["moments2_c"], rtol=1e-6)
    np.testing.assert_allclose(s, g["moments2_s"], rtol=1e-6)

    mask3 = np.zeros((12, 20, 24), np.uint8)
    mask3[3:9, 5:15, 6:20] = 1
    c3, s3 = array_kits.compute_robust_moments(mask3, indexing="ij", min_std=0.0)
    np.testing.assert_allclose(c3, g["moments3_c"], rtol=1e-6)
    np.testing.assert_allclose(s3, g["moments3_s"], rtol=1e-6)

    cb, sb = array_kits.compute_robust_moments(g["blob"], indexing="ij",
                                               min_std=2.0)
    np.testing.assert_allclose(cb, g["momentsb_c"], rtol=1e-6)
    np.testing.assert_allclose(sb, g["momentsb_s"], rtol=1e-6)


def test_gaussian_distribution_golden(g):
    ours = array_kits.create_gaussian_distribution(
        (32, 40), center=[12.5, 20.0], stddev=[3.0, 5.0])
    np.testing.assert_allclose(ours, g["gauss1"], atol=1e-6)

    ours2 = array_kits.create_gaussian_distribution_v2(
        (32, 40), g["gauss2_centers"], g["gauss2_stddevs"])
    np.testing.assert_allclose(ours2, g["gauss2"], atol=1e-6)


def test_device_gaussian_guide_matches_reference(g):
    """The jitted guide render (ops/guides.gaussian_guide) reproduces the
    reference numpy create_gaussian_distribution_v2 values."""
    from boxsegliver_tpu.ops.guides import gaussian_guide

    ours = np.asarray(gaussian_guide((32, 40), g["gauss2_centers"],
                                     g["gauss2_stddevs"], keepdims=False))
    np.testing.assert_allclose(ours, g["gauss2"], atol=1e-5)


def test_gd_image_golden(g):
    labels = np.zeros((48, 56), np.uint8)
    labels[5:15, 6:18] = 1
    labels[25:40, 30:50] = 1
    gd, c, s = array_kits.get_gd_image_single_obj(
        labels[5:15, 6:18], center_perturb=0.0, stddev_perturb=0.0)
    np.testing.assert_allclose(gd, g["gd_single"], atol=1e-6)
    np.testing.assert_allclose(c, g["gd_single_c"], rtol=1e-6)
    np.testing.assert_allclose(s, g["gd_single_s"], rtol=1e-6)

    multi = array_kits.get_gd_image_multi_objs(
        g["labels_multi"], obj_value=1, center_perturb=0.0,
        stddev_perturb=0.0, with_fake_guides=False)
    np.testing.assert_allclose(multi, g["gd_multi"], atol=1e-6)


# ---------------------------------------------------------------------------
# line rasterization + lesion matching + FP handling
# ---------------------------------------------------------------------------

def test_xiaolinwu_line_golden(g):
    xs, ys, fwd = array_kits.xiaolinwu_line(2, 3, 17, 11)
    np.testing.assert_array_equal(xs, g["xwu_xs"])
    np.testing.assert_array_equal(ys, g["xwu_ys"])
    assert bool(fwd) == bool(g["xwu_fwd"])
    xs2, ys2, fwd2 = array_kits.xiaolinwu_line(10, 14, 3, 2)
    np.testing.assert_array_equal(xs2, g["xwu2_xs"])
    np.testing.assert_array_equal(ys2, g["xwu2_ys"])
    assert bool(fwd2) == bool(g["xwu2_fwd"])


def test_object_correspondences_golden(g):
    from boxsegliver_tpu.ops.metrics3d import \
        distinct_binary_object_correspondences

    res = distinct_binary_object_correspondences(g["corr_pred"], g["corr_gt"])
    labeled_res, labeled_ref, n_res, n_ref, mapping = res
    assert [n_res, n_ref] == g["corr_n"].tolist()
    np.testing.assert_array_equal(labeled_res, g["corr_labeled_res"])
    np.testing.assert_array_equal(labeled_ref, g["corr_labeled_ref"])
    assert sorted(mapping) == g["corr_map_keys"].tolist()
    vals = [mapping[k][0] for k in sorted(mapping)]
    ious = [mapping[k][1] for k in sorted(mapping)]
    assert vals == g["corr_map_vals"].tolist()
    np.testing.assert_allclose(ious, g["corr_map_ious"], rtol=1e-6)


def test_find_tp_and_fp_golden(g):
    """Reference criterion: predicted object with Dice < 0.1 vs reference
    foreground is a false positive, even with grazing overlap."""
    tp, fp = array_kits.find_tp_and_fp(g["corr_pred"], g["corr_gt"])
    fp_golden = np.zeros_like(fp)
    for z1, y1, x1, z2, y2, x2 in g["findtp_fp"]:
        fp_golden[z1:z2, y1:y2, x1:x2] = True
    # golden fp bboxes cover exactly our fp objects
    np.testing.assert_array_equal(fp, fp_golden & (g["corr_pred"] > 0))
    assert not (tp & fp).any()
    assert ((tp | fp) == (g["corr_pred"] > 0)).all()


def test_reduce_fp_with_guide_golden(g):
    first = array_kits.reduce_fp_with_guide(g["corr_gt"], g["corr_pred"],
                                            guide="first")
    np.testing.assert_array_equal(first, g["fp_reduced_first"])
    middle = array_kits.reduce_fp_with_guide(g["corr_gt"], g["corr_pred"],
                                             guide="middle")
    np.testing.assert_array_equal(middle, g["fp_reduced_middle"])


# ---------------------------------------------------------------------------
# 3D metrics (medpy formulas + reference utils/surface.py distances)
# ---------------------------------------------------------------------------

def test_metric3d_golden(g):
    out = metrics3d.metric_3d(g["surf_a"], g["surf_b"],
                              required=["Dice", "VOE", "RVD", "ASSD", "RMSD",
                                        "MSD"],
                              sampling=tuple(g["surf_spacing"]))
    assert out["Dice"] == pytest.approx(float(g["vol_dice"]), rel=1e-6)
    # Reference scale is FRACTIONAL, not percent: VOE = 1 - medpy jc and
    # RVD = |medpy ravd| with no x100 (reference loss_metrics.py:446-450).
    assert out["VOE"] == pytest.approx(1.0 - float(g["vol_jc"]), rel=1e-6)
    assert out["RVD"] == pytest.approx(abs(float(g["vol_ravd"])), rel=1e-6)
    assert out["ASSD"] == pytest.approx(float(g["surf_assd"]), rel=1e-5)
    assert out["RMSD"] == pytest.approx(float(g["surf_rmsd"]), rel=1e-5)
    assert out["MSD"] == pytest.approx(float(g["surf_msd"]), rel=1e-5)


# ---------------------------------------------------------------------------
# GLCM props (reference utils/array_kits.py:1140-1243)
# ---------------------------------------------------------------------------

def test_glcm_props_golden(g):
    feats = ["contrast", "dissimilarity", "homogeneity", "energy", "entropy",
             "correlation", "cluster_shade", "cluster_prominence", "asm"]
    _, props = glcm_features(g["glcm_patch"], distances=[1, 2],
                             angles=[0, np.pi / 2], levels=64, symmetric=True,
                             normed=True, features=feats, flat=True,
                             norm_levels=True)
    for k in feats:
        np.testing.assert_allclose(props[k], g[f"glcm_{k}"], rtol=1e-5,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# k-fold split (reference DataLoader/misc.py:24-74 + committed LiTS folds)
# ---------------------------------------------------------------------------

def test_kfold_generator_matches_reference(g, tmp_path):
    from boxsegliver_tpu.data.kfold import read_or_create_k_folds

    folds = read_or_create_k_folds(tmp_path / "k.txt", list(range(131)),
                                   k_split=5, seed=1357)
    for i in range(5):
        assert [int(x) for x in folds[i]] == g[f"kfold_{i}"].tolist()


def test_kfold_reads_committed_lits_folds(tmp_path):
    """The reference's committed LiTS split is shipped as data
    (configs/data/LiTS_k_folds.txt) and the reader reproduces it verbatim —
    fold-identical training is a parity prerequisite."""
    import shutil

    from boxsegliver_tpu.data.kfold import read_or_create_k_folds
    pkg_copy = (Path(__file__).parent.parent / "boxsegliver_tpu" / "configs"
                / "data" / "LiTS_k_folds.txt")
    assert pkg_copy.exists()
    shutil.copy(pkg_copy, tmp_path / "k_folds.txt")
    folds = read_or_create_k_folds(tmp_path / "k_folds.txt", None)
    expected = []
    for line in (FIX / "lits_k_folds.txt").read_text().splitlines():
        expected.append(line.split(":")[1].split())
    assert folds == expected
    assert sorted(int(x) for f in folds for x in f) == list(range(131))


# ---------------------------------------------------------------------------
# losses vs the reference TF1 formulas (loss_metrics.py:114-231), with
# SUM_BY_NONZERO_WEIGHTS reduction
# ---------------------------------------------------------------------------

def _softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _oracle_weights(w_type, one_hot, numeric_w=None, proportion_decay=None):
    bs, h, w, nc = one_hot.shape
    if w_type == "none":
        return np.float64(1.0)
    if w_type == "numerical":
        wv = np.asarray(numeric_w, np.float64)
        wmap = (wv[None, None, None, :] * one_hot).sum(-1)
    elif w_type == "proportion":
        num_labels = one_hot.sum(axis=(1, 2))
        if proportion_decay:
            num_labels = num_labels + proportion_decay
        proportions = 1.0 / num_labels
        wv = proportions / proportions.sum(axis=1, keepdims=True)
        wmap = (wv[:, None, None, :] * one_hot).sum(-1)
    else:
        raise ValueError(w_type)
    return wmap / wmap.sum(axis=(1, 2), keepdims=True) * (h * w)


def _oracle_wsce(logits, labels, w_type, **kw):
    nc = logits.shape[-1]
    one_hot = np.eye(nc)[labels]
    probs = _softmax_np(logits.astype(np.float64))
    ce = -np.log(np.take_along_axis(probs, labels[..., None], axis=-1))[..., 0]
    w = _oracle_weights(w_type, one_hot, **kw)
    w = np.broadcast_to(w, ce.shape)
    nz = np.count_nonzero(w)
    return (ce * w).sum() / nz


def _oracle_dice(logits, labels):
    nc = logits.shape[-1]
    probs = _softmax_np(logits.astype(np.float64))[..., 1:]
    one_hot = np.eye(nc)[labels][..., 1:]
    inter = (one_hot * probs).sum(axis=(1, 2, 3))
    union = (one_hot + probs).sum(axis=(1, 2, 3))
    return 1.0 - np.mean(2.0 * inter / (union + 1e-8))


@pytest.fixture(scope="module")
def loss_data():
    rng = np.random.RandomState(3)
    logits = rng.normal(size=(2, 16, 16, 3)).astype(np.float32) * 2
    labels = rng.randint(0, 3, (2, 16, 16)).astype(np.int32)
    return logits, labels


def test_wsce_golden(loss_data):
    logits, labels = loss_data
    for w_type, kw in (("none", {}), ("numerical", {"numeric_w": [0.2, 0.4, 4.4]}),
                       ("proportion", {"proportion_decay": 1000})):
        ours = float(losses.weighted_sparse_softmax_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), w_type, **kw))
        want = _oracle_wsce(logits, labels, w_type, **kw)
        assert ours == pytest.approx(want, rel=1e-4), w_type


def test_dice_loss_golden(loss_data):
    logits, labels = loss_data
    probs = jnp.asarray(_softmax_np(logits.astype(np.float64)), jnp.float32)
    ours = float(losses.sparse_dice_loss(probs, jnp.asarray(labels)))
    want = _oracle_dice(logits, labels)
    assert ours == pytest.approx(want, rel=1e-4)
