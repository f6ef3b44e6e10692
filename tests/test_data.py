"""Data layer tests: NIfTI IO, k-folds, meta extraction, sampler, device pipeline."""

import argparse
import json

import numpy as np
import pytest

from boxsegliver_tpu.data import nii
from boxsegliver_tpu.data.kfold import (random_split_k_fold,
                                        read_or_create_k_folds,
                                        train_test_split)
from boxsegliver_tpu.data import meta as meta_mod
from boxsegliver_tpu.data import synthetic
from boxsegliver_tpu.data.sampler import TrainSampler
from boxsegliver_tpu.data.pipeline import TrainDataset, process_train_batch


def _args(**kw):
    ns = argparse.Namespace(
        im_height=64, im_width=64, im_channel=3, zoom_scale=[1.0, 1.25],
        batch_size=4, tumor_percent=0.5, guide_percent=0.66, test_fold=0,
        k_folds=4, noise_scale=0.05, random_flip=3, random_window=False,
        use_context=False, use_spatial=False, hist_scale=20.0,
        hist_noise=False, hist_noise_scale=0.002, spatial_random=1.0,
        spatial_inner_random=False, center_random_ratio=0.2,
        stddev_random_ratio=0.4, min_std=2.0, max_objs=8, host_workers=1,
        context_list=None)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


# ---------------------------------------------------------------------------
# NIfTI IO
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.int16, np.uint8, np.float32])
def test_nii_roundtrip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 100, (5, 7, 9)).astype(dtype)
    path = tmp_path / ("x" + suffix)
    nii.write_nii(vol, path, zooms=(2.5, 0.8, 0.8))
    hdr, back = nii.read_nii(path)
    np.testing.assert_array_equal(back, vol)
    assert hdr.get_data_shape() == (9, 7, 5)  # (x, y, z) like nibabel
    np.testing.assert_allclose(hdr.get_zooms(), (0.8, 0.8, 2.5), rtol=1e-6)


def test_nii_special_flip(tmp_path):
    vol = np.arange(24).reshape(2, 3, 4).astype(np.int16)
    path = tmp_path / "f.nii"
    nii.write_nii(vol, path)
    _, flipped = nii.read_nii(path, special=True)
    np.testing.assert_array_equal(flipped, vol[:, ::-1])


# ---------------------------------------------------------------------------
# K-folds
# ---------------------------------------------------------------------------

def test_kfold_split_deterministic():
    a = random_split_k_fold(list(range(23)), 5, seed=1357)
    b = random_split_k_fold(list(range(23)), 5, seed=1357)
    assert a == b
    assert sorted(sum(a, [])) == list(range(23))
    sizes = [len(f) for f in a]
    assert max(sizes) - min(sizes) <= 1


def test_kfold_persist_and_reread(tmp_path):
    path = tmp_path / "k_folds.txt"
    folds = read_or_create_k_folds(path, list(range(10)), k_split=3, seed=1)
    again = read_or_create_k_folds(path, list(range(999)), k_split=7, seed=9)
    assert [[str(x) for x in f] for f in folds] == again
    train, test = train_test_split(again, 1)
    assert set(train) | set(test) == set(str(i) for i in range(10))
    assert not set(train) & set(test)


# ---------------------------------------------------------------------------
# Meta extraction (schema parity with reference extract.py:160-176)
# ---------------------------------------------------------------------------

def test_process_case_schema_and_consistency():
    rng = np.random.default_rng(1)
    vol, lab, spacing = synthetic.make_case(rng, shape=(16, 48, 48))
    m = meta_mod.process_case(vol, lab, spacing, pid=7)
    for key in ("PID", "size", "spacing", "bbox", "tumors", "tumor_areas",
                "tumor_centers", "tumor_stddevs", "tumor_slices_from_to",
                "tumor_slices", "tumor_slices_index", "tumor_slices_centers",
                "tumor_slices_stddevs", "tumor_slices_areas", "tumor_slices_tid"):
        assert key in m, key
    assert m["PID"] == 7 and m["size"] == [16, 48, 48]
    # run-length list consistency
    n_regions = m["tumor_slices_from_to"][-1]
    assert len(m["tumor_slices_centers"]) == n_regions
    assert len(m["tumor_slices_tid"]) == n_regions
    assert len(m["tumor_slices_from_to"]) == len(m["tumor_slices_index"]) + 1
    # every 2D center lies inside its slice bbox
    for c, bb in zip(m["tumor_slices_centers"], m["tumor_slices"]):
        assert bb[0] - 1 <= c[0] <= bb[2] + 1
        assert bb[1] - 1 <= c[1] <= bb[3] + 1
    # organ bbox ([z1, y1, x1, z2+1, y2+1, x2+1]) covers all tumors' z-range
    for t in m["tumors"]:
        assert t[0] >= m["bbox"][0] and t[3] <= m["bbox"][3]


def test_synthetic_dataset_and_prior(tmp_path):
    root = synthetic.make_synthetic_dataset(tmp_path / "ds", n_cases=2,
                                            shape=(12, 40, 40), k_split=2)
    metas = meta_mod.load_meta(root)
    assert len(metas) == 2
    assert (root / "volume-0" / "volume.npy").exists()
    assert (root / "k_folds.txt").exists()
    # hist features: [depth, 200], organ histogram sums to ~1/binwidth density
    h = np.load(root / "feat" / "hist" / "train" / "000.npy")
    assert h.shape == (12, 200)
    assert np.all(np.isfinite(h))
    # prior.json: every entry has z-range + center + stddev
    prior = json.loads((root / "prior.json").read_text())
    assert set(prior) == {"0", "1"}
    for case in prior.values():
        for objs in case.values():
            for o in objs:
                assert len(o["z"]) == 2 and len(o["center"]) == 2


def test_extract_roundtrip_nifti(tmp_path):
    """NIfTI → extract_dataset → meta + npy cache."""
    rng = np.random.default_rng(3)
    src = tmp_path / "src"
    src.mkdir()
    vol, lab, spacing = synthetic.make_case(rng, shape=(10, 32, 32))
    nii.write_nii(vol, src / "volume-0.nii", zooms=spacing[::-1])
    nii.write_nii(lab, src / "segmentation-0.nii", zooms=spacing[::-1])
    metas = meta_mod.extract_dataset(src, tmp_path / "dst", lits_quirk=False)
    assert metas[0]["size"] == [10, 32, 32]
    cached = np.load(tmp_path / "dst" / "volume-0" / "volume.npy")
    assert cached.dtype == np.uint16
    expect = meta_mod.window_clip_uint16(vol)
    np.testing.assert_array_equal(cached, expect)


# ---------------------------------------------------------------------------
# Sampler + device pipeline
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    return synthetic.make_synthetic_dataset(root, n_cases=3, shape=(14, 96, 96),
                                            k_split=3, seed=5)


def test_sampler_shapes_and_balance(dataset):
    args = _args()
    s = TrainSampler(dataset, args, mode="train", seed=0, resize_on_host=False)
    b = s.sample_batch(4)
    assert b["window"].shape == (4, 3, 80, 80)  # ceil(64*1.25)=80
    assert b["label"].shape == (4, 80, 80)
    assert b["crop_hw"].min() >= 64 and b["crop_hw"].max() <= 80
    assert set(b["label"].flatten().tolist()) <= {0, 1, 2}
    # tumor forcing: at least ceil(4*0.5)=2 samples contain tumor pixels
    n_tumor = sum(1 for i in range(4) if (b["label"][i] == 2).any())
    assert n_tumor >= 1  # crop may clip the tumor, but typically >= 2


def test_sampler_host_resize_mode(dataset):
    args = _args()
    s = TrainSampler(dataset, args, mode="train", seed=0)  # default: host resize
    b = s.sample_batch(4)
    assert b["image"].shape == (4, 64, 64, 3)
    assert b["image"].dtype == np.uint16
    assert b["label"].shape == (4, 64, 64)
    assert set(b["label"].flatten().tolist()) <= {0, 1, 2}
    assert b["pad_mask"].max() == 1.0


def test_sampler_guides(dataset):
    args = _args(use_spatial=True, use_context=True)
    s = TrainSampler(dataset, args, mode="train", seed=0, resize_on_host=False)
    b = s.sample_batch(4)
    assert b["centers"].shape == (4, 8, 2)
    assert b["context"].shape == (4, 200)
    assert b["n_objs"].max() >= 1
    valid = b["centers"][b["n_objs"] > 0]
    assert valid.max() < 96


def test_process_train_batch_outputs(dataset):
    import jax
    args = _args(use_spatial=True)
    s = TrainSampler(dataset, args, mode="train", seed=0)
    b = s.sample_batch(4)
    feats, labels = process_train_batch(
        {k: np.asarray(v) for k, v in b.items()}, jax.random.PRNGKey(0),
        im_h=64, im_w=64, noise_scale=0.05, random_flip=3, use_spatial=True,
        min_std=2.0)
    assert feats["images"].shape == (4, 64, 64, 3)
    assert feats["sp_guide"].shape == (4, 64, 64, 1)
    assert labels.shape == (4, 64, 64)
    img = np.asarray(feats["images"])
    assert img.min() >= -0.06 and img.max() <= 1.06  # [0,1] + noise
    g = np.asarray(feats["sp_guide"])
    assert g.min() >= 0.5 - 1e-5 and g.max() <= 1.0 + 1e-5
    # guided samples have a peak above background
    n_objs = np.asarray(b["n_objs"])
    for i in range(4):
        if n_objs[i] > 0:
            assert g[i].max() > 0.9


def test_train_dataset_iterates(dataset):
    args = _args(batch_size=2)
    s = TrainSampler(dataset, args, mode="train", seed=0)
    ds = TrainDataset(s, args, seed=0, prefetch=2, workers=1)
    try:
        feats, labels = next(ds)
        assert feats["images"].shape == (2, 64, 64, 3)
        feats2, _ = next(ds)
        assert not np.allclose(np.asarray(feats["images"]),
                               np.asarray(feats2["images"]))
    finally:
        ds.close()


def test_sampler_determinism(dataset):
    """Single keyed-PRNG story (SURVEY.md §7 risks): same seed → identical
    sampling decisions; different seed → different batches."""
    args = _args()
    b1 = TrainSampler(dataset, args, mode="train", seed=42).sample_batch(4)
    b2 = TrainSampler(dataset, args, mode="train", seed=42).sample_batch(4)
    b3 = TrainSampler(dataset, args, mode="train", seed=43).sample_batch(4)
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])
    assert any(not np.array_equal(b1[k], b3[k]) for k in b1)


def test_device_augmentation_determinism(dataset):
    import jax
    args = _args()
    s = TrainSampler(dataset, args, mode="train", seed=0, resize_on_host=False)
    b = {k: np.asarray(v) for k, v in s.sample_batch(2).items()}
    kwargs = dict(im_h=64, im_w=64, noise_scale=0.05, random_flip=3,
                  use_spatial=False, min_std=2.0)
    f1, l1 = process_train_batch(b, jax.random.PRNGKey(7), **kwargs)
    f2, l2 = process_train_batch(b, jax.random.PRNGKey(7), **kwargs)
    f3, _ = process_train_batch(b, jax.random.PRNGKey(8), **kwargs)
    np.testing.assert_array_equal(np.asarray(f1["images"]), np.asarray(f2["images"]))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert not np.array_equal(np.asarray(f1["images"]), np.asarray(f3["images"]))


def test_kfold_empty_fold_line_parses_empty(tmp_path):
    """A fold with no cases (k > n_cases) round-trips as an empty list, not
    [''] (int('') crash in TrainSampler)."""
    from boxsegliver_tpu.data.kfold import read_or_create_k_folds
    p = tmp_path / "k_folds.txt"
    p.write_text("Fold 0:1 2\nFold 1:3\nFold 2:\n")
    folds = read_or_create_k_folds(p, [])
    assert folds == [["1", "2"], ["3"], []]


def test_prepare_glcm_subcommand(tmp_path, capsys):
    """`prepare glcm` dumps feat/glcm/{train,eval}/<PID>.npy (reference
    extract.py GLCM menu entries)."""
    from boxsegliver_tpu.cli import prepare
    from boxsegliver_tpu.data.synthetic import make_synthetic_dataset
    root = tmp_path / "ds"
    make_synthetic_dataset(root, n_cases=2, shape=(8, 48, 48), k_split=2)
    prepare.main(["glcm", "--dst", str(root)])
    for mode in ("train", "eval"):
        files = sorted((root / "feat" / "glcm" / mode).glob("*.npy"))
        assert len(files) == 2
        import numpy as np
        feats = np.load(files[0])
        assert feats.shape[-1] == 96  # 8 props x 12 distance/angle combos


def test_hard_case_band_properties():
    """The band-v2+ hard generator: lesion and distractor intensity deltas sit
    in DISJOINT per-case bands, the band assignment flips across cases (so the
    marginal is symmetric and appearance alone stays capped), and the signal
    is physically present in the written volume — the per-case GT-region
    histogram (the hist context feature) can therefore disambiguate.  This is
    what makes gunet_both > gunet_sp reproducible (reference
    experiments.md:40-41,120)."""
    rng = np.random.default_rng(7)
    flips, order_ok = [], []
    for _ in range(16):
        vol, lab, _sp, info = synthetic.make_nf_hard_case(
            rng, shape=(16, 96, 96), return_info=True)
        mu_l, mu_d = info["mu_lesion"], info["mu_distractor"]
        assert abs(mu_l - mu_d) >= 20.0          # disjoint bands
        flips.append(mu_l > mu_d)
        assert lab.sum() > 0 and info["distractors"].sum() > 0
        # the written volume must preserve the band ordering: GT-region mean
        # vs distractor-region mean sorts the same way as the drawn bands —
        # this is exactly the signal the per-case GT histogram (hist context
        # feature) carries and the distractor twins lack
        les = float(vol[lab == 1].mean())
        dis = float(vol[info["distractors"]].mean())
        order_ok.append((les > dis) == (mu_l > mu_d))
    assert any(flips) and not all(flips)         # band assignment flips
    assert np.mean(order_ok) >= 14 / 16, order_ok


def test_hard_case_background_never_zero():
    """v3: the hard generator must have NO exact-zero pixels, like real NF
    MRI.  A zero background turns the reference-parity UNMASKED eval z-score
    (evaluators/eval_loader.py nf_zscore) into a train/eval domain shift —
    the round-4 ladder collapse (all rungs <0.15 Dice at eval with 0.9+
    train Dice)."""
    rng = np.random.default_rng(11)
    vol, lab, _sp = synthetic.make_nf_hard_case(rng, shape=(8, 64, 64))
    assert (vol > 0).all(), f"{(vol == 0).sum()} exact-zero pixels"


def test_hard_case_train_eval_zscore_consistent(tmp_path):
    """End-to-end pin of the round-4 eval-collapse fix: the masked TRAIN
    z-score (data/pipeline._augment_tail, zeros stay 0) and the UNMASKED
    reference-parity EVAL z-score (evaluators/eval_loader.parse_case_eval
    nf_zscore) must agree on the stored hard-benchmark volumes.  On v2 data
    (zero background) they disagreed by ~3 sigma on ~45% of pixels."""
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval

    root = synthetic.make_synthetic_dataset(
        tmp_path / "ds", n_cases=1, shape=(8, 64, 64), modality="nf",
        variant="hard", seed=3)
    meta = load_meta(root)[0]
    case = parse_case_eval(meta, root, im_channel=1, parse_label=False,
                           norm="nf_zscore", whole_frame=True)
    stored = np.load(root / "volume-0" / "volume.npy").astype(np.float32)
    for z in range(stored.shape[0]):
        img = stored[z]
        region = (img > 0).astype(np.float32)
        cnt = max(region.sum(), 1.0)
        mean = (img * region).sum() / cnt
        var = (np.square(img - mean) * region).sum() / cnt
        train_z = (img - region * mean) / (region * np.sqrt(var) + 1e-8)
        np.testing.assert_allclose(case.volume[z], train_z, atol=5e-2)
