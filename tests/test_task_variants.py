"""Task-variant + hygiene tests: only_liver / tumor pipelines (reference
Liver/input_pipeline_li.py, Tumor/input_pipeline.py), the --save_sp_guide
NIfTI dump (input_pipeline_g.py:1478-1496), and gen_infer_context
(Liver/extract.py:742-793)."""

import json

import jax
import numpy as np
import pytest

from boxsegliver_tpu.cli.main import get_args
from boxsegliver_tpu.data.pipeline import _process_batch, norm_statics
from boxsegliver_tpu.data.sampler import TrainSampler
from boxsegliver_tpu.data.synthetic import make_synthetic_dataset

BS = 8


@pytest.fixture(scope="module")
def liver_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tv") / "synthetic"
    make_synthetic_dataset(root, n_cases=4, shape=(12, 96, 96), k_split=4)
    return root


def _args(root, model_dir, task, *extra):
    return get_args([
        task, "--mode", "train", "--tag", "tv", "--model", "UNet",
        "--model_config", "UNet_TINY.yml",
        "--classes", "Liver" if task == "only_liver" else "Tumor",
        "--batch_size", str(BS), "--im_height", "64", "--im_width", "64",
        "--im_channel", "3", "--test_fold", "0", "--k_folds", "4",
        "--noise_scale", "0", "--random_flip", "0",
        "--model_dir", str(model_dir), "--data_root", str(root.parent),
        "--dataset", root.name, *extra])


def test_only_liver_task(liver_root, tmp_path):
    args = _args(liver_root, tmp_path / "m", "only_liver")
    statics = norm_statics(args)
    assert statics["label_mode"] == "liver01"
    s = TrainSampler(liver_root, args, mode="train")
    assert s.liver_only
    batch = s.sample_batch(BS, rng=np.random.RandomState(0))
    # random window always on in only_liver training
    # (input_pipeline_li.py:304-307)
    assert len(np.unique(batch["clip"][:, 0])) > 1 or \
        len(np.unique(batch["clip"][:, 1])) > 1
    feats, labels = jax.jit(lambda b, k: _process_batch(
        b, k, im_h=64, im_w=64, noise_scale=0.0, random_flip=0,
        use_spatial=False, min_std=2.0, **statics))(
        batch, jax.random.PRNGKey(0))
    labels = np.asarray(labels)
    assert set(np.unique(labels)) <= {0, 1}
    # tumor voxels merged into liver: label 1 covers both source classes
    raw = batch["label"]
    np.testing.assert_array_equal(labels, np.clip(raw, 0, 1))


def test_tumor_task(liver_root, tmp_path):
    args = _args(liver_root, tmp_path / "m", "tumor")
    statics = norm_statics(args)
    assert statics["label_mode"] == "tumor"
    s = TrainSampler(liver_root, args, mode="train")
    batch = s.sample_batch(BS, rng=np.random.RandomState(1))
    feats, labels = jax.jit(lambda b, k: _process_batch(
        b, k, im_h=64, im_w=64, noise_scale=0.0, random_flip=0,
        use_spatial=False, min_std=2.0, **statics))(
        batch, jax.random.PRNGKey(0))
    labels = np.asarray(labels)
    assert set(np.unique(labels)) <= {0, 1}
    np.testing.assert_array_equal(labels, (batch["label"] == 2).astype(np.int32))
    # tumor-centered forcing still active: some crops contain tumor
    assert labels.sum() > 0


def test_save_sp_guide(liver_root, tmp_path):
    """run_g --save_sp_guide dumps guide-F/B-<pid>.nii.gz volumes at the
    original frame."""
    args = _args(liver_root, tmp_path / "mg", "liver", "--use_spatial")
    args.mode = "eval"
    args.save_sp_guide = True
    from boxsegliver_tpu.data import nii as nii_kits
    from boxsegliver_tpu.evaluators.volume import EvaluateVolume

    (tmp_path / "mg").mkdir(parents=True, exist_ok=True)
    metas = json.loads((liver_root / "meta.json").read_text())
    prior = json.loads((liver_root / "prior.json").read_text())
    ev = EvaluateVolume(args, liver_root, ["Liver", "Tumor"])

    def stub_predict(feats):
        bs = feats["images"].shape[0]
        out = np.zeros((bs, 64, 64, 3), np.float32)
        out[..., 0] = 1.0
        return out

    ev.run_g(stub_predict, metas[:1], prior=prior, do_eval=False)
    pid = metas[0]["PID"]
    guides = sorted((tmp_path / "mg" / "sp_guide").glob("guide-*.nii.gz"))
    names = {g.name for g in guides}
    assert f"guide-F-{pid}.nii.gz" in names
    assert f"guide-B-{pid}.nii.gz" in names
    _, arr = nii_kits.read_nii(guides[0])
    assert arr.shape == tuple(metas[0]["size"])
    assert arr.min() >= 0 and arr.max() <= 255


def test_gen_infer_context(liver_root, tmp_path):
    from boxsegliver_tpu.data.meta import gen_infer_context

    metas = json.loads((liver_root / "meta.json").read_text())
    m = metas[0]
    # one user ellipse on the first tumor slice, spanning 3 slices
    sid = m["tumor_slices_index"][0]
    guide = {str(m["PID"]): {str(sid): [{
        "center": m["tumor_slices_centers"][0],
        "stddev": [max(s, 2.0) for s in m["tumor_slices_stddevs"][0]],
        "z": [sid, min(sid + 3, m["size"][0])],
    }]}}
    gfile = tmp_path / "interaction.json"
    gfile.write_text(json.dumps(guide))
    written = gen_infer_context(liver_root, gfile)
    assert len(written) == 1
    feats = np.load(written[0])
    assert feats.shape == (m["size"][0], 200)
    # annotated z-range slices carry guide histograms; others are zero
    assert feats[sid, 100:].sum() > 0
    far = (sid + 5) % m["size"][0]
    if far not in range(sid, sid + 3):
        assert feats[far, 100:].sum() == 0
