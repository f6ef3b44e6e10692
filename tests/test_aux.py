"""Auxiliary subsystem tests: GLCM, summaries, cascade, viewer."""

import json

import numpy as np
import pytest

from boxsegliver_tpu.interactive.cascade import Cascade2D
from boxsegliver_tpu.ops.glcm import (ALL_FEATURES, case_glcm_features,
                                      glcm_features, greycomatrix, greycoprops)
from boxsegliver_tpu.utils.summary import SummaryWriter, profile_trace
from boxsegliver_tpu.utils.viewer import save_case_overlays


# ---------------------------------------------------------------------------
# GLCM (reference array_kits.py:1140-1243)
# ---------------------------------------------------------------------------

def test_greycomatrix_known_values():
    # skimage doc example
    img = np.array([[0, 0, 1, 1],
                    [0, 0, 1, 1],
                    [0, 2, 2, 2],
                    [2, 2, 3, 3]], np.uint8)
    P = greycomatrix(img, [1], [0], levels=4, symmetric=False, normed=False)
    expected = np.array([[2, 2, 1, 0],
                         [0, 2, 0, 0],
                         [0, 0, 3, 1],
                         [0, 0, 0, 1]], np.float64)
    np.testing.assert_array_equal(P[:, :, 0, 0], expected)
    # symmetric + normed sums to 1
    Pn = greycomatrix(img, [1], [0], levels=4, symmetric=True, normed=True)
    assert abs(Pn[:, :, 0, 0].sum() - 1.0) < 1e-12


def test_greycoprops_all_features():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 32, (24, 24)).astype(np.uint8)
    P = greycomatrix(img, [1, 2], [0, np.pi / 2], levels=32)
    res = greycoprops(P, props=ALL_FEATURES)
    for k in ALL_FEATURES:
        assert res[k].shape == (2, 2)
        assert np.isfinite(res[k]).all()
    # uniform image: contrast 0, homogeneity 1, energy 1
    flat = np.full((16, 16), 7, np.uint8)
    Pf = greycomatrix(flat, [1], [0], levels=32)
    rf = greycoprops(Pf, props=("contrast", "homogeneity", "energy"))
    assert rf["contrast"][0, 0] == 0.0
    assert abs(rf["homogeneity"][0, 0] - 1.0) < 1e-12
    assert abs(rf["energy"][0, 0] - 1.0) < 1e-12


def test_glcm_features_norm_and_case(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    _, res = glcm_features(img, [1, 2, 3], [0, np.pi / 4, np.pi / 2,
                                            3 * np.pi / 4],
                           features=("contrast", "dissimilarity", "homogeneity",
                                     "energy", "correlation"),
                           flat=True, norm_levels=True)
    flatvec = np.concatenate(list(res.values()))
    assert flatvec.shape == (5 * 12,)

    # per-case dump over a synthetic meta
    from boxsegliver_tpu.data import synthetic
    from boxsegliver_tpu.data.meta import (GRAY_MIN, IM_SCALE,
                                           dump_glcm_features, load_meta)
    root = synthetic.make_synthetic_dataset(tmp_path / "ds", n_cases=1,
                                            shape=(10, 48, 48), k_split=1,
                                            with_features=False, seed=31)
    dump_glcm_features(root, filter_size=4)
    meta = load_meta(root)[0]
    feats = np.load(root / "feat" / "glcm" / "train" / "000.npy")
    # reference "all" layout: 8 props x 3 distances x 4 angles = 96 dims
    assert feats.shape == (10, 96)
    # tumor slices have non-zero features, non-tumor are zero
    tumor_z = set(meta["tumor_slices_index"])
    for z in range(10):
        if z in tumor_z and np.any(feats[z]):
            break
    else:
        pytest.fail("No tumor slice produced GLCM features")


# ---------------------------------------------------------------------------
# Summaries / profiler
# ---------------------------------------------------------------------------

def test_summary_writer_jsonl_and_tb(tmp_path):
    w = SummaryWriter(tmp_path, prefix="exp1")
    w.scalars({"loss": 0.5, "Liver/Dice": 0.9}, step=10)
    w.image("img", np.random.rand(8, 8), step=10)
    w.close()
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert {"exp1/loss", "exp1/Liver/Dice"} == {l["tag"] for l in lines}
    # TB event file exists (torch TB available in this image)
    assert list(tmp_path.glob("events.out.tfevents.*"))


def test_profile_trace(tmp_path):
    import jax.numpy as jnp
    with profile_trace(tmp_path, enabled=True):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert (tmp_path / "profile").exists()


# ---------------------------------------------------------------------------
# 2D→3D cascade
# ---------------------------------------------------------------------------

def test_cascade_extra_channel():
    vol = np.zeros((6, 16, 16), np.float32)
    vol[:, 4:12, 4:12] = 1.0

    def oracle(feats):
        x = feats["images"][..., feats["images"].shape[-1] // 2]
        fg = (x > 0.5).astype(np.float32)
        return np.stack([1 - fg, fg], axis=-1)

    c = Cascade2D(oracle, batch_size=4, im_channel=3, eval_mirror=True,
                  channel_mode="binary")
    ch = c.extra_channel(vol)
    assert ch.shape == (6, 16, 16)
    np.testing.assert_array_equal(ch, (vol > 0.5).astype(np.float32))

    c2 = Cascade2D(oracle, batch_size=4, im_channel=3, channel_mode="edt",
                   tau=2.0)
    ch2 = c2.extra_channel(vol)
    assert ch2.max() <= 1.0 and ch2.min() >= 0.0
    # boundary has the highest values, far background lowest
    assert ch2[0, 4, 4] > ch2[0, 0, 0]


# ---------------------------------------------------------------------------
# Headless viewer
# ---------------------------------------------------------------------------

def test_viewer_overlays(tmp_path):
    vol = np.random.rand(4, 24, 24).astype(np.float32)
    lab = np.zeros((4, 24, 24), np.uint8)
    lab[1:3, 8:16, 8:16] = 1
    pred = np.roll(lab, 2, axis=1)
    out = save_case_overlays(vol, lab, pred, tmp_path, "case7",
                             scores={"Dice": 0.8})
    assert (out / "sheet.png").exists()
    assert len(list(out.glob("slice_*.png"))) >= 1


# ---------------------------------------------------------------------------
# Checkpoint tools (reference utils/ckpt_kits.py)
# ---------------------------------------------------------------------------

def test_ckpt_tools_roundtrip(tmp_path):
    import orbax.checkpoint as ocp
    from boxsegliver_tpu.utils.ckpt_tools import (ckpt_vars_rename,
                                                  find_checkpoint, list_vars)
    tree = {"params": {"Encode1": {"kernel": np.ones((3, 3), np.float32)},
                       "Decode1": {"bias": np.zeros((4,), np.float32)}}}
    src = tmp_path / "src"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(src.resolve(), tree, force=True)
    ckptr.wait_until_finished()

    vars_ = list_vars(src)
    assert vars_["params/Encode1/kernel"][0] == (3, 3)

    out = tmp_path / "renamed"
    renamed = ckpt_vars_rename(src, out, ["Encode"], ["Enc"])
    assert "Enc1" in renamed["params"]
    reloaded = list_vars(out)
    assert "params/Enc1/kernel" in reloaded

    # find_checkpoint over a trainer-layout model_dir
    model_dir = tmp_path / "model"
    (model_dir / "ckpt" / "500").mkdir(parents=True)
    (model_dir / "ckpt" / "1500").mkdir(parents=True)
    (model_dir / "ckpt_best" / "best").mkdir(parents=True)
    assert find_checkpoint(model_dir).name == "1500"
    assert find_checkpoint(model_dir, "checkpoint_best").name == "best"
