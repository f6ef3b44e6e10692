"""Evaluator tests: aligned crop, slice batching, mirror TTA averaging,
volume reassembly correctness (oracle Dice ≈ 1), postprocess chain, NIfTI save."""

import argparse

import numpy as np
import pytest

from boxsegliver_tpu.data import nii, synthetic
from boxsegliver_tpu.data.meta import load_meta
from boxsegliver_tpu.evaluators.base import EvaluateBase
from boxsegliver_tpu.evaluators.eval_loader import (aligned_bbox,
                                                    parse_case_eval,
                                                    slice_batches)
from boxsegliver_tpu.evaluators.volume import EvaluateVolume

CLASSES = ["Liver", "Tumor"]


def _args(**kw):
    ns = argparse.Namespace(
        im_height=64, im_width=64, im_channel=3, batch_size=4,
        eval_mirror=False, random_flip=3, metrics_eval=["Dice", "VOE", "RVD"],
        primary_metric="Liver/Dice", secondary_metric=None, eval_num=-1,
        eval_skip_num=0, pred_type="pred", save_path="prediction",
        use_global_dice=False, use_context=False, context_list=None,
        hist_scale=20.0, model_dir="/tmp/nope")
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalds")
    return synthetic.make_synthetic_dataset(root, n_cases=2, shape=(12, 64, 64),
                                            k_split=2, seed=7,
                                            with_features=False)


def test_aligned_bbox_properties(dataset):
    meta = load_meta(dataset)[0]
    z1, z2, y1, y2, x1, x2 = aligned_bbox(meta, align=16, padding=25)
    d, h, w = meta["size"]
    assert 0 <= z1 < z2 <= d
    assert (y2 - y1) % 16 == 0 and (x2 - x1) % 16 == 0
    assert 0 <= y1 and y2 <= h and 0 <= x1 and x2 <= w
    # covers the organ bbox
    assert z1 <= meta["bbox"][0] and z2 >= meta["bbox"][3]


def test_parse_case_eval_shapes(dataset):
    meta = load_meta(dataset)[0]
    case = parse_case_eval(meta, dataset, im_channel=3)
    z1, z2, y1, y2, x1, x2 = case.crop
    assert case.volume.shape == (case.depth + case.lhc + case.rhc,
                                 y2 - y1, x2 - x1)
    assert case.segmentation.shape == (case.depth, y2 - y1, x2 - x1)
    assert 0.0 <= case.volume.min() and case.volume.max() <= 1.0
    assert case.lhc == 1 and case.rhc == 1


def test_slice_batches_cover_all_slices(dataset):
    meta = load_meta(dataset)[0]
    case = parse_case_eval(meta, dataset, im_channel=3)
    batches = list(slice_batches(case, 4, (64, 64)))
    n_slices = sum(4 for _ in batches)
    assert n_slices >= case.depth
    assert batches[-1]["pads"] == (4 - case.depth % 4) % 4
    # center channel of batch b, slot j equals cropped slice z (+lhc offset)
    flat = np.concatenate([b["images"][..., 1] for b in batches], axis=0)
    for z in range(case.depth):
        np.testing.assert_allclose(flat[z], case.volume[z + case.lhc], rtol=1e-5)


def _pixel_oracle(feats):
    """Orientation-equivariant fake model: probs from center-channel pixels."""
    x = feats["images"][..., 1]
    p1 = np.clip(x, 0, 1) * 0.6
    p2 = np.clip(1 - x, 0, 1) * 0.3
    p0 = 1.0 - p1 - p2
    return np.stack([p0, p1, p2], axis=-1)


def test_mirror_tta_equivalence(dataset):
    """For a pixelwise (flip-equivariant) model, mirror-averaged probs must
    equal the plain forward (reference mirror-average contract,
    evaluator_liver.py:642-656)."""
    meta = load_meta(dataset)[0]
    case = parse_case_eval(meta, dataset, im_channel=3)
    ev_plain = EvaluateVolume(_args(), dataset, CLASSES)
    ev_tta = EvaluateVolume(_args(eval_mirror=True), dataset, CLASSES)
    p1 = ev_plain.predict_case(_pixel_oracle, case)
    p2 = ev_tta.predict_case(_pixel_oracle, case)
    assert p1.shape == (case.depth, 64, 64, 3)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


class _LabelOracle:
    """Returns one-hot probs of the true cropped labels, tracking z order."""

    def __init__(self, case, batch_size):
        self.case = case
        self.bs = batch_size
        self.z = 0

    def __call__(self, feats):
        bs = feats["images"].shape[0]
        out = np.zeros((bs,) + self.case.segmentation.shape[1:] + (3,), np.float32)
        for j in range(bs):
            z = self.z + j
            lab = (self.case.segmentation[z] if z < self.case.depth
                   else np.zeros_like(self.case.segmentation[0]))
            for c in range(3):
                out[j, ..., c] = lab == c
        self.z += bs
        return out


def test_evaluate_case_oracle_dice_is_one(dataset):
    meta = load_meta(dataset)[0]
    case = parse_case_eval(meta, dataset, im_channel=3)
    args = _args(im_height=case.segmentation.shape[1],
                 im_width=case.segmentation.shape[2])
    ev = EvaluateVolume(args, dataset, CLASSES)
    probs = ev.predict_case(_LabelOracle(case, args.batch_size), case)
    acc = {}
    from collections import defaultdict
    acc = defaultdict(int)
    results = ev.evaluate_case(case, probs, acc)
    assert results["Liver/Dice"] > 0.999
    assert results["Tumor/Dice"] > 0.999
    assert results["Liver/VOE"] < 1e-3
    # global dice accumulator agrees
    denom = 2 * acc["Tumor_tp"] + acc["Tumor_fp"] + acc["Tumor_fn"]
    assert 2 * acc["Tumor_tp"] / denom > 0.999


def test_postprocess_chain():
    ev = EvaluateVolume(_args(), "/tmp/none", CLASSES)
    vol = np.zeros((8, 16, 16), np.uint8)
    vol[2:6, 4:12, 4:12] = 1          # liver blob
    vol[3:5, 6:8, 6:8] = 2            # tumor inside
    vol[0, 0:2, 0:2] = 1              # small spurious liver CC
    vol[7, 14:16, 14:16] = 2          # tumor FP outside liver
    out = ev.postprocess(vol)
    assert not out["Liver"][0, 0, 0]          # largest-CC removed small blob
    assert out["Liver"][3, 6, 6]              # tumor merged into liver
    assert not out["Tumor"][7, 14, 14]        # FP masked by liver
    assert out["Tumor"][3, 6, 6]
    # labels skip largest-CC filtering
    lab = ev.postprocess(vol, is_label=True)
    assert lab["Liver"][0, 0, 0]


def test_run_and_save(dataset, tmp_path):
    metas = load_meta(dataset)
    meta = metas[0]
    case = parse_case_eval(meta, dataset, im_channel=3)
    args = _args(im_height=case.segmentation.shape[1],
                 im_width=case.segmentation.shape[2], eval_num=1)

    oracle_holder = {}

    def predict(feats):
        if "oracle" not in oracle_holder:
            oracle_holder["oracle"] = _LabelOracle(case, args.batch_size)
        return oracle_holder["oracle"](feats)

    ev = EvaluateVolume(args, dataset, CLASSES)
    results = ev.run(predict, [meta], save=True, save_path=tmp_path / "pred")
    assert results["Liver/Dice"] > 0.999
    assert results["GTumorDice"] > 0.999
    out = tmp_path / "pred" / f"predict-{meta['PID']}.nii.gz"
    assert out.exists()
    _, saved = nii.read_nii(out)
    assert saved.shape == tuple(meta["size"])
    assert set(np.unique(saved)) <= {0, 1, 2}
    # saved volume matches GT segmentation closely (liver+tumor encoding)
    lab = np.load(dataset / f"volume-{meta['PID']}" / "segmentation.npy")
    agree = (saved == lab).mean()
    assert agree > 0.999


def test_evaluate_base_csv_and_compare(tmp_path):
    ev = EvaluateBase(["Background", "Liver"], ["Dice"], "Liver/Dice")
    ev.append_metrics({"Liver/Dice": 0.9})
    ev.append_metrics({"Liver/Dice": 0.8})
    assert ev.mean_metrics()["Liver/Dice"] == pytest.approx(0.85)
    ev.save_metrics(tmp_path / "m.csv", cases=["a", "b"])
    text = (tmp_path / "m.csv").read_text()
    assert "Liver/Dice" in text and "0.9" in text
    assert ev.compare({"Liver/Dice": 0.9}, {"Liver/Dice": 0.8})


def test_patch_eval_oracle(dataset):
    """--eval_in_patches: tiled overlap-averaged eval reproduces oracle."""
    meta = load_meta(dataset)[0]
    case = parse_case_eval(meta, dataset, im_channel=3)
    ch, cw = case.segmentation.shape[1:]
    args = _args(im_height=ch // 2, im_width=cw // 2, eval_in_patches=True,
                 batch_size=4)
    ev = EvaluateVolume(args, dataset, CLASSES)

    def oracle(feats):
        """Pixelwise classifier from image intensity: reproduces the same
        labels regardless of tiling (bg≈0.09, tumor≈0.49, liver≈0.57)."""
        x = feats["images"][..., 1]
        p_bg = (x < 0.3).astype(np.float32)
        p_tm = ((x >= 0.3) & (x < 0.53)).astype(np.float32)
        p_lv = (x >= 0.53).astype(np.float32)
        return np.stack([p_bg, p_lv, p_tm], axis=-1)

    probs = ev.predict_case_patches(oracle, case)
    assert probs.shape == (case.depth, ch, cw, 3)
    results = ev.evaluate_case(case, probs)
    # intensity thresholds are noisy near boundaries; still high Dice
    assert results["Liver/Dice"] > 0.9


def test_eval_results_persisted(dataset, tmp_path):
    meta = load_meta(dataset)[0]
    case = parse_case_eval(meta, dataset, im_channel=3)
    args = _args(im_height=case.segmentation.shape[1],
                 im_width=case.segmentation.shape[2],
                 model_dir=str(tmp_path))
    ev = EvaluateVolume(args, dataset, CLASSES)
    holder = {}

    def predict(feats):
        if "o" not in holder:
            holder["o"] = _LabelOracle(case, args.batch_size)
        return holder["o"](feats)

    ev.run(predict, [meta])
    import json
    saved = json.loads((tmp_path / "eval_results_3d.txt").read_text())
    assert saved["Liver/Dice"] > 0.999


def test_online_eval_jitted_batch_metrics_match_host():
    """OnlineEval2D's single-jitted-call metric path (one device dispatch per
    batch — the eager per-metric jnp calls cost a tunnel round trip per op on
    TPU backends) must reproduce the host-side metric fns and ConfusionMatrix
    counts exactly (reference evaluator_liver.py:164-332 2D branch +
    loss_metrics.py:506-580)."""
    import jax

    from boxsegliver_tpu.evaluators.online2d import OnlineEval2D
    from boxsegliver_tpu.ops.metrics import METRIC_FNS, ConfusionMatrix

    ev = object.__new__(OnlineEval2D)
    ev.classes = ["Background", "Liver", "Tumor"]
    ev.metric_names = ["Dice", "VOE", "RVD", "ASSD"]  # ASSD: no 2D fn, skipped
    ev.use_global_dice = True
    fn = jax.jit(ev._batch_metrics)

    rng = np.random.RandomState(7)
    probs = rng.dirichlet([1.0, 1.0, 1.0], size=(4, 16, 16)).astype(np.float32)
    labels = rng.randint(0, 3, size=(4, 16, 16))
    vals = jax.device_get(fn(probs, labels))

    for i, cls in enumerate(ev.classes[1:], start=1):
        pred_i = (probs[..., i] > 0.5).astype(np.float32)
        lab_i = (labels == i).astype(np.float32)
        for met in ["Dice", "VOE"]:
            want = float(METRIC_FNS[met.lower()](pred_i[..., None],
                                                 lab_i[..., None]))
            assert abs(float(vals[f"{cls}/{met}"]) - want) < 1e-5, (cls, met)
        # RVD is emitted as a presence-masked (sum, n) pair; with every
        # sample non-empty here, sum/n == the plain host batch mean
        per = METRIC_FNS["rvd"](pred_i[..., None], lab_i[..., None],
                                reduce=False)
        n = float(vals[f"_masked_n/{cls}/RVD"])
        assert n == probs.shape[0]
        got = float(vals[f"_masked_sum/{cls}/RVD"]) / n
        assert abs(got - float(np.mean(per))) < 1e-4, cls
        cm = ConfusionMatrix(pred_i, lab_i)
        for kind in ["tp", "fp", "tn", "fn"]:
            assert int(vals[f"_cm/{kind}/{cls}"]) == getattr(cm, kind)
    assert not any(k.endswith("ASSD") for k in vals)


def test_online_eval_rvd_masks_empty_gt_samples():
    """A single empty-GT sample must not blow up the epoch RVD (round-5
    full-length run: the raw per-sample formula divides by ~0 and one such
    eval sample made the logged epoch RVD ~1e4-1e6 while Dice stayed sane).
    Empty-GT samples are masked out of the RVD mean; Dice/VOE (the
    selection metrics) keep the reference's plain batch mean."""
    import jax
    import jax.numpy as jnp

    from boxsegliver_tpu.evaluators.online2d import OnlineEval2D

    ev = object.__new__(OnlineEval2D)
    ev.classes = ["Background", "NF"]
    ev.metric_names = ["Dice", "VOE", "RVD"]
    ev.use_global_dice = False
    ev._metrics_fn = jax.jit(ev._batch_metrics)
    ev._key = jax.random.PRNGKey(0)
    ev.process_fn = lambda batch, key: (batch, batch.pop("labels"))

    # 3 samples with GT, 1 empty-GT sample that the model predicts ON
    labels = np.zeros((4, 8, 8), np.int32)
    labels[:3, 2:6, 2:6] = 1
    probs = np.zeros((4, 8, 8, 2), np.float32)
    probs[..., 0] = 1.0
    probs[:, 3:5, 3:5, 1] = 1.0  # predicts a blob on all 4, incl. sample 3
    probs[:, 3:5, 3:5, 0] = 0.0

    class _T:
        summary = None
        global_step = 0
        predict = staticmethod(lambda feats: jnp.asarray(probs))

    ev.batches = [{"labels": labels.copy()}]
    out = ev.__call__(_T())
    # masked: RVD = mean over the 3 GT samples of |4-16|/16 * 100 = 75%
    assert abs(out["NF/RVD"] - 75.0) < 1e-3
    assert not any(k.startswith("_masked_") for k in out)
    # all-empty-GT edge: defined as 0, not inf
    ev.batches = [{"labels": np.zeros((4, 8, 8), np.int32)}]
    out2 = ev.__call__(_T())
    assert out2["NF/RVD"] == 0.0
