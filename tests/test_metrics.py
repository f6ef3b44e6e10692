import jax.numpy as jnp
import numpy as np

from boxsegliver_tpu.ops import metrics
from boxsegliver_tpu.ops import metrics3d


def test_metric_dice_perfect():
    x = jnp.ones((2, 8, 8, 1))
    d = float(metrics.metric_dice(x, x))
    np.testing.assert_allclose(d, 1.0, atol=1e-5)


def test_metric_dice_half_overlap():
    pred = np.zeros((1, 4, 4, 1), np.float32)
    pred[0, :2] = 1
    lab = np.zeros((1, 4, 4, 1), np.float32)
    lab[0, 1:3] = 1
    d = float(metrics.metric_dice(jnp.asarray(pred), jnp.asarray(lab)))
    np.testing.assert_allclose(d, 0.5, atol=1e-4)


def test_metric_voe_and_vd():
    pred = np.zeros((1, 4, 4, 1), np.float32)
    pred[0, :2] = 1  # 8 px
    lab = np.zeros((1, 4, 4, 1), np.float32)
    lab[0, 1:3] = 1  # 8 px, 4 overlap
    voe = float(metrics.metric_voe(jnp.asarray(pred), jnp.asarray(lab)))
    np.testing.assert_allclose(voe, 100 * (1 - 4 / 12), rtol=1e-3)
    vd = float(metrics.metric_vd(jnp.asarray(pred), jnp.asarray(lab)))
    np.testing.assert_allclose(vd, 0.0, atol=1e-3)


def test_build_train_metrics_keys():
    probs = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32))
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 3, (2, 8, 8)))
    out = metrics.build_train_metrics(probs, labels, ["Background", "Liver", "Tumor"],
                                      ["Dice", "VOE"])
    assert set(out) == {"Liver/Dice", "Liver/VOE", "Tumor/Dice", "Tumor/VOE"}


def test_confusion_matrix_global_dice():
    cm = metrics.ConfusionMatrix()
    a = np.zeros((4, 4), np.int32); a[:2] = 1
    b = np.zeros((4, 4), np.int32); b[1:3] = 1
    cm.add(a, b)
    cm.add(b, b)
    # case1: tp=4 fp=4 fn=4; case2: tp=8 fp=0 fn=0 → dice = 2*12/(2*12+4+4)
    np.testing.assert_allclose(cm.global_dice, 24 / 32, rtol=1e-6)


def test_metric_3d_overlap_values():
    a = np.zeros((8, 8, 8), np.int32); a[:4] = 1
    b = np.zeros((8, 8, 8), np.int32); b[2:6] = 1
    out = metrics3d.metric_3d(a, b, required=["Dice", "VOE", "RVD"])
    np.testing.assert_allclose(out["Dice"], 0.5, atol=1e-6)
    np.testing.assert_allclose(out["VOE"], 1 - 128 / 384, atol=1e-6)
    np.testing.assert_allclose(out["RVD"], 0.0, atol=1e-6)


def test_metric_3d_surface_distances_shifted_cube():
    # cube shifted by 2 voxels along z: MSD = 2, ASSD > 0
    a = np.zeros((16, 16, 16), np.int32); a[2:8, 4:12, 4:12] = 1
    b = np.zeros((16, 16, 16), np.int32); b[4:10, 4:12, 4:12] = 1
    out = metrics3d.metric_3d(a, b)
    np.testing.assert_allclose(out["MSD"], 2.0, atol=1e-6)
    assert 0 < out["ASSD"] < 2.0
    assert out["RMSD"] >= out["ASSD"]
    # spacing scales distances
    out2 = metrics3d.metric_3d(a, b, sampling=[2.0, 1.0, 1.0])
    np.testing.assert_allclose(out2["MSD"], 4.0, atol=1e-6)


def test_metric_3d_empty_surface():
    a = np.zeros((8, 8, 8), np.int32)
    b = np.zeros((8, 8, 8), np.int32); b[2:4] = 1
    out = metrics3d.metric_3d(a, b)
    assert out["ASSD"] == 0.0 and out["MSD"] == 0.0 and out["Dice"] == 0.0


def test_tumor_detection_metrics():
    ref = np.zeros((16, 16, 16), np.int32)
    ref[2:5, 2:5, 2:5] = 1
    ref[10:13, 10:13, 10:13] = 1
    res = np.zeros_like(ref)
    res[2:5, 2:5, 2:5] = 1          # true positive
    res[10:11, 2:3, 10:11] = 1      # false positive
    out = metrics3d.tumor_detection_metrics(res, ref, iou_thresh=0.5)
    assert out["tp"] == 1 and out["fp"] == 1 and out["pos"] == 2
    np.testing.assert_allclose(out["precision"], 0.5)
    np.testing.assert_allclose(out["recall"], 0.5)
