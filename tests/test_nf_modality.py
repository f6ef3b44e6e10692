"""NF 2D modality tests: z-score/gamma train options, NF normalization
windows, zero-background guides, sp-point guided eval, and an end-to-end
`nf` task train + eval run (reference DataLoader/NF/input_pipeline_g.py)."""

import numpy as np
import jax
import pytest

from boxsegliver_tpu.cli.main import evaluate, get_args, train
from boxsegliver_tpu.data.pipeline import _process_batch, norm_statics
from boxsegliver_tpu.data.sampler import TrainSampler
from boxsegliver_tpu.data.synthetic import make_synthetic_dataset
from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval
from boxsegliver_tpu.evaluators.volume import EvaluateVolume

BS = 8


@pytest.fixture(scope="module")
def nf_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nf_mod") / "synthetic_nf"
    make_synthetic_dataset(root, n_cases=4, shape=(12, 96, 96), k_split=4,
                           modality="nf")
    return root


def _args(root, model_dir, *extra, task="nf"):
    return get_args([
        task, "--mode", "train", "--tag", "t_nf",
        "--model", "UNet", "--model_config", "UNet_TINY.yml",
        "--classes", "NF", "--batch_size", str(BS),
        "--im_height", "64", "--im_width", "64", "--im_channel", "3",
        "--test_fold", "0", "--k_folds", "4",
        "--noise_scale", "0", "--random_flip", "0",
        "--model_dir", str(model_dir),
        "--data_root", str(root.parent), "--dataset", root.name,
        "--num_of_total_steps", "6", "--log_step", "3",
        "--host_workers", "1", *extra,
    ])


def test_nf_clip_window(nf_root, tmp_path):
    """NF task clips to (0, 900)·IM_SCALE instead of the CT window
    (reference NF/input_pipeline_g.py:464-470)."""
    from boxsegliver_tpu.data.meta import IM_SCALE

    args = _args(nf_root, tmp_path / "m")
    s = TrainSampler(nf_root, args, mode="train")
    assert s.nf
    b = s.sample_batch(BS, rng=np.random.RandomState(0))
    np.testing.assert_allclose(b["clip"][:, 0], 0.0)
    np.testing.assert_allclose(b["clip"][:, 1], 900.0 * IM_SCALE)

    args_rw = _args(nf_root, tmp_path / "m2", "--random_window")
    s2 = TrainSampler(nf_root, args_rw, mode="train")
    b2 = s2.sample_batch(BS, rng=np.random.RandomState(0))
    assert np.all(b2["clip"][:, 1] >= 800 * IM_SCALE)
    assert np.all(b2["clip"][:, 1] <= 1000 * IM_SCALE)


def test_zscore_and_gamma_statics(nf_root, tmp_path):
    args = _args(nf_root, tmp_path / "m", "--zscore", "--gamma")
    statics = norm_statics(args)
    assert statics["zscore"] and statics["use_gamma"]
    assert statics["guide_bg"] == 0.0

    s = TrainSampler(nf_root, args, mode="train")
    batch = s.sample_batch(BS, rng=np.random.RandomState(1))
    feats, labels = jax.jit(lambda b, k: _process_batch(
        b, k, im_h=64, im_w=64, noise_scale=0.0, random_flip=0,
        use_spatial=False, min_std=2.0, zscore=True, use_gamma=False))(
        batch, jax.random.PRNGKey(0))
    img = np.asarray(feats["images"])
    for j in range(2):
        nz = np.asarray(batch["image"][j], np.float32) > 0
        if nz.sum() > 100:
            assert abs(img[j][nz].mean()) < 0.05
            assert abs(img[j][nz].std() - 1.0) < 0.1

    # gamma on: pixel values change but stats are retained (retain_stats=True)
    feats_g, _ = jax.jit(lambda b, k: _process_batch(
        b, k, im_h=64, im_w=64, noise_scale=0.0, random_flip=0,
        use_spatial=False, min_std=2.0, zscore=True, use_gamma=True))(
        batch, jax.random.PRNGKey(0))
    img_g = np.asarray(feats_g["images"])
    assert not np.allclose(img_g, img, atol=1e-4)
    assert abs(img_g[0].mean() - img[0].mean()) < 0.05


def test_nf_guide_background_zero(nf_root, tmp_path):
    """NF spatial guides keep raw [0, 1] Gaussians on zero background; the
    Liver pipeline remaps to [0.5, 1] (input_pipeline_g.py:388-391)."""
    args = _args(nf_root, tmp_path / "m", "--use_spatial")
    s = TrainSampler(nf_root, args, mode="train")
    batch = s.sample_batch(BS, rng=np.random.RandomState(2))

    def run(guide_bg):
        return jax.jit(lambda b, k: _process_batch(
            b, k, im_h=64, im_w=64, noise_scale=0.0, random_flip=0,
            use_spatial=True, min_std=2.0, guide_bg=guide_bg))(
            batch, jax.random.PRNGKey(0))[0]["sp_guide"]

    g_nf = np.asarray(run(0.0))
    g_liver = np.asarray(run(0.5))
    assert g_nf.min() == pytest.approx(0.0, abs=1e-6)
    assert g_liver.min() == pytest.approx(0.5, abs=1e-6)
    # remap identity: liver = nf/2 + 0.5 for the same moments
    np.testing.assert_allclose(g_liver, g_nf * 0.5 + 0.5, atol=1e-5)


def test_parse_case_eval_nf_norms(nf_root):
    import json
    meta = json.loads((nf_root / "meta.json").read_text())[0]
    case = parse_case_eval(meta, nf_root, im_channel=3, norm="nf_clip",
                           whole_frame=True)
    assert case.crop == (0, meta["size"][0], 0, meta["size"][1],
                         0, meta["size"][2])
    assert 0.0 <= case.volume.min() and case.volume.max() <= 1.0

    case_z = parse_case_eval(meta, nf_root, im_channel=3, norm="nf_zscore",
                             whole_frame=True)
    # reference-exact NF eval z-score: stats from nonzero voxels, applied
    # UNMASKED (NF/input_pipeline_g.py:699-705) — statistics computed over
    # the originally-nonzero region standardize to ~(0, 1)
    mid_raw = case_z.depth // 2
    zmid = case_z.volume[case_z.lhc + mid_raw]
    raw = np.load(nf_root / f"volume-{meta['PID']}" / "volume.npy")
    nz = np.asarray(raw[mid_raw]) > 0
    assert abs(zmid[nz].mean()) < 0.2
    assert abs(zmid[nz].std() - 1.0) < 0.2


def test_run_sp_with_perfect_predictor(nf_root, tmp_path):
    """sp-point guided eval plumbing: a predictor that returns the GT gets
    Dice ≈ 1, guides are rendered only on tumor slices with zero bg."""
    args = _args(nf_root, tmp_path / "m", "--use_spatial")
    args.mode = "eval"
    import json
    metas = json.loads((nf_root / "meta.json").read_text())
    ev = EvaluateVolume(args, nf_root, ["NF"])
    assert ev.nf and ev.norm == "nf_clip"

    state = {}

    def perfect_predict(feats):
        # guides must arrive with zero background
        g = feats["sp_guide"]
        state.setdefault("gmin", []).append(float(g.min()))
        state.setdefault("gmax", []).append(float(g.max()))
        pid = state["pid"]
        lab = np.load(nf_root / f"volume-{pid}" / "segmentation.npy")
        z0 = state["z"]
        bs = feats["images"].shape[0]
        out = np.zeros((bs, 64, 64, 2), np.float32)
        out[..., 0] = 1.0
        import cv2
        for j in range(bs):
            if z0 + j < lab.shape[0]:
                lj = cv2.resize(lab[z0 + j], (64, 64),
                                interpolation=cv2.INTER_NEAREST)
                out[j, ..., 1] = lj
                out[j, ..., 0] = 1.0 - lj
        state["z"] += bs
        return out

    results = {}
    for meta in metas[:1]:
        state["pid"] = meta["PID"]
        state["z"] = 0
        results = ev.run_sp(perfect_predict, [meta], do_eval=True)
    assert results["NF/Dice"] > 0.95
    assert min(state["gmin"]) == pytest.approx(0.0, abs=1e-6)
    assert max(state["gmax"]) <= 1.0 + 1e-6
    assert max(state["gmax"]) > 0.1  # some guide actually rendered


def test_nf_task_end_to_end(nf_root, tmp_path):
    """VERDICT item 4 'done' criterion: an nf task end-to-end run (train +
    eval) on synthetic NF-like data with z-score + gamma."""
    import logging
    logger = logging.getLogger("boxsegliver")
    args = _args(nf_root, tmp_path / "model", "--zscore", "--gamma")
    args.num_replicas = 2
    train(args, nf_root, logger)

    args.mode = "eval"
    args.eval_final = True
    results = evaluate(args, nf_root, logger, do_eval=True)
    assert "NF/Dice" in results
    assert np.isfinite(results["NF/Dice"])


def test_nf_3d_task_alias():
    """nf_3d positional selects the 3D NF pairing (reference entry/main.py)."""
    from boxsegliver_tpu.cli.main import get_args, is_3d
    args = get_args([
        "nf_3d", "--mode", "train", "--tag", "t", "--model", "UNet3D",
        "--classes", "NF", "--im_depth", "8", "--model_dir", "/tmp/x"])
    assert args.task == "nf" and is_3d(args)
    assert args.dataset == "NF"
    with pytest.raises(SystemExit):
        get_args(["nf_3d", "--mode", "train", "--tag", "t", "--model", "UNet",
                  "--classes", "NF", "--model_dir", "/tmp/x"])
