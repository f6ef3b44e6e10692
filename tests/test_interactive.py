"""Interactive machinery tests: click simulation, guide propagation state
machine, refinement loops, native geodesic/CC extension."""

import argparse

import numpy as np
import pytest
from scipy import ndimage as ndi

from boxsegliver_tpu.csrc import (geodesic_available, geodesic_distance,
                                  label_components, largest_component)
from boxsegliver_tpu.interactive.clicks import (inter_simulation,
                                                next_click_from_error,
                                                simulate_batch_clicks)
from boxsegliver_tpu.interactive.refine import (interactive_eval_2d,
                                                interactive_eval_3d,
                                                render_click_guide)
from boxsegliver_tpu.ops import array_kits


# ---------------------------------------------------------------------------
# Click simulation (reference input_pipeline_g_simply.py:346-412)
# ---------------------------------------------------------------------------

def _disk(shape, cy, cx, r):
    yy, xx = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]), indexing="ij")
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2)


def test_fg_clicks_inside_object():
    mask = _disk((64, 64), 32, 32, 15).astype(np.uint8)
    rng = np.random.RandomState(0)
    pts = inter_simulation(mask, margin=3, step=5, N=5, random=False, rng=rng)
    assert pts.shape[1] == 2 and len(pts) >= 1
    for y, x in pts.astype(int):
        assert mask[y, x] == 1
    # min-distance exclusion between clicks
    if len(pts) > 1:
        d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        assert d.min() > 5 - 1e-6


def test_bg_clicks_band_strategy():
    mask = _disk((64, 64), 32, 32, 10).astype(np.uint8)
    rng = np.random.RandomState(1)
    pts = inter_simulation(1 - mask, margin=3, step=5, N=4, bg=True, d=10,
                           strategy=1, random=False, rng=rng)
    for y, x in pts.astype(int):
        assert mask[y, x] == 0
        # inside the band: within margin+d+slack of the object
        dist = np.sqrt((y - 32) ** 2 + (x - 32) ** 2)
        assert dist < 10 + 3 + 10 + 2


def test_strategy3_spreads_clicks():
    mask = _disk((64, 64), 32, 32, 8).astype(np.uint8)
    rng = np.random.RandomState(2)
    pts = inter_simulation(1 - mask, margin=2, step=3, N=6, bg=True, d=20,
                           strategy=3, random=False, rng=rng)
    assert len(pts) >= 3
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    assert d.min() > 3


def test_simulate_batch_and_small_object():
    label = np.zeros((32, 32), np.uint8)
    label[15:17, 15:17] = 1  # tiny object → centroid fallback
    fg, bg = simulate_batch_clicks(label, margin=3, step=4, N=3,
                                   rng=np.random.RandomState(3))
    assert all(label[int(y), int(x)] for y, x in fg)


def test_next_click_from_error():
    label = _disk((32, 32), 16, 16, 8)
    pred = np.zeros_like(label)
    coords, is_fg = next_click_from_error(pred, label)
    assert is_fg and label[coords]
    # over-segmentation → negative click
    pred2 = _disk((32, 32), 16, 16, 12)
    coords, is_fg = next_click_from_error(pred2, label)
    assert not is_fg and not label[coords]
    # perfect prediction → no click
    coords, is_fg = next_click_from_error(label, label)
    assert coords is None


# ---------------------------------------------------------------------------
# Line / FP utilities (reference array_kits.py:987-1139)
# ---------------------------------------------------------------------------

def test_xiaolinwu_line_and_ascent():
    xs, ys, fwd = array_kits.xiaolinwu_line(0, 0, 5, 3)
    assert (xs[0], ys[0]) == (0, 0) and (xs[-1], ys[-1]) == (5, 3)
    img = np.zeros((10, 10), np.float32)
    yy, xx = np.meshgrid(np.arange(10), np.arange(10), indexing="ij")
    img = -np.sqrt((yy - 5.0) ** 2 + (xx - 5.0) ** 2)  # peak at (5, 5)
    assert array_kits.ascent_line(img, 0, 0, 5, 5)       # toward peak: ascent
    assert not array_kits.ascent_line(img, 5, 5, 0, 0)   # away: descent


def test_reduce_fp_with_guide():
    ref = np.zeros((6, 20, 20), np.uint8)
    ref[1:4, 3:8, 3:8] = 1                    # guided object
    res = ref.copy()
    res[5, 15:18, 15:18] = 1                  # spurious prediction
    out = array_kits.reduce_fp_with_guide(ref, res, guide="middle")
    assert out[2, 4, 4] == 1
    assert out[5, 16, 16] == 0


def test_find_tp_and_fp():
    ref = np.zeros((16, 16), np.uint8)
    ref[2:6, 2:6] = 1
    res = np.zeros_like(ref)
    res[3:5, 3:5] = 1      # overlaps → TP
    res[10:12, 10:12] = 1  # no overlap → FP
    tp, fp = array_kits.find_tp_and_fp(res, ref)
    assert tp[3, 3] and not tp[10, 10]
    assert fp[10, 10] and not fp[3, 3]


# ---------------------------------------------------------------------------
# Native extension
# ---------------------------------------------------------------------------

def test_native_builds_and_components():
    mask = np.zeros((4, 16, 16), np.uint8)
    mask[0:2, 2:6, 2:6] = 1
    mask[3, 10:14, 10:14] = 1
    labels, n = label_components(mask, connectivity=1)
    assert n == 2
    ref_labels, ref_n = ndi.label(mask, ndi.generate_binary_structure(3, 1))
    assert ref_n == 2
    # same partition (label ids may differ)
    for val in (1, 2):
        ours = labels == val
        match = [(ref_labels == r).sum() for r in (1, 2)]
        assert ours.sum() in match
    big = largest_component(mask)
    assert big.sum() == max((mask[0:2] > 0).sum(), (mask[3] > 0).sum())


@pytest.mark.skipif(not geodesic_available(), reason="native build failed")
def test_geodesic_distance_properties():
    img = np.zeros((32, 32), np.float32)
    seeds = np.zeros((32, 32), np.uint8)
    seeds[16, 16] = 1
    # lamb=0 → spatial distance: should approximate Euclidean
    d = geodesic_distance(img, seeds, lamb=0.0, iterations=2)
    assert d[16, 16] == 0
    assert abs(d[16, 26] - 10.0) < 0.5
    assert abs(d[26, 26] - 10 * np.sqrt(2)) < 0.7
    # intensity barrier raises geodesic distance
    img2 = np.zeros((32, 32), np.float32)
    img2[:, 20] = 10.0  # wall
    d2 = geodesic_distance(img2, seeds, lamb=1.0, iterations=4)
    assert d2[16, 25] > d[16, 25]


def test_geodesic_3d_runs():
    if not geodesic_available():
        pytest.skip("native build failed")
    img = np.zeros((8, 16, 16), np.float32)
    seeds = np.zeros_like(img, np.uint8)
    seeds[4, 8, 8] = 1
    d = geodesic_distance(img, seeds, lamb=0.0, iterations=2)
    assert d[4, 8, 8] == 0 and d[4, 8, 12] > 0
    assert np.isfinite(d).all()


# ---------------------------------------------------------------------------
# Refinement loops with a pixel oracle
# ---------------------------------------------------------------------------

class _GuidedOracle:
    """Fake model that segments by thresholding fg-bg guide (predicts exactly
    where positive clicks dominate) — lets the loop converge."""

    def __call__(self, feats):
        g = feats["sp_guide"]
        if g.shape[-1] == 2:
            score = g[..., 0] - g[..., 1]
        else:
            score = g[..., 0]
        fg = (score > 0.05).astype(np.float32)
        return np.stack([1 - fg, fg], axis=-1)


def test_interactive_eval_2d_converges():
    label = _disk((32, 32), 16, 16, 9).astype(np.uint8)[None]
    images = np.zeros((1, 32, 32, 1), np.float32)
    out = interactive_eval_2d(_GuidedOracle(), images, label,
                              dice_thresh=0.7, max_iters=15, stddev=6.0)
    assert out["Dice"] > 0.7
    assert 1 <= out["clicks"] <= 15


def test_interactive_eval_3d_runs():
    label = np.zeros((8, 24, 24), np.uint8)
    label[2:6, 8:16, 8:16] = 1
    volume = label.astype(np.float32)

    def oracle(feats):
        x = feats["images"]
        guide = x[..., -1]
        fg = (guide > 0.05).astype(np.float32)
        return np.stack([1 - fg, fg], axis=-1)

    out = interactive_eval_3d(oracle, volume, label, dice_thresh=0.5,
                              max_iters=10, stddev=4.0)
    assert out["clicks"] >= 1
    assert out["Dice"] > 0.3


# ---------------------------------------------------------------------------
# Guide propagation loader
# ---------------------------------------------------------------------------

def test_guide_propagation_state_machine(tmp_path):
    from boxsegliver_tpu.data import synthetic
    from boxsegliver_tpu.data.meta import load_meta, simulate_user_prior
    from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval
    from boxsegliver_tpu.interactive.propagation import GuidePropagationLoader

    root = synthetic.make_synthetic_dataset(tmp_path / "ds", n_cases=1,
                                            shape=(12, 64, 64), k_split=1,
                                            with_features=False, seed=11)
    metas = load_meta(root)
    prior = simulate_user_prior(metas)
    case = parse_case_eval(metas[0], root, im_channel=3)
    args = argparse.Namespace(im_height=case.volume.shape[1],
                              im_width=case.volume.shape[2],
                              min_std=1.0, eval_discount=0.85,
                              random_flip=3, eval_mirror=True)
    loader = GuidePropagationLoader(case, prior[str(metas[0]["PID"])], args)

    guided_slices = 0
    for idx in loader.sweep("Forward"):
        feats = loader.slice_features(idx)
        assert feats["images"].shape[0] == 4  # 1 + 3 mirrors in ONE batch
        assert feats["sp_guide"].shape == feats["images"].shape[:3] + (1,)
        g = feats["sp_guide"][0, ..., 0]
        if loader.curr_info:
            guided_slices += 1
            assert g.max() > 0.6  # guide peak present
            # feed back the TRUE tumor mask: propagation should keep it
            true_tumor = (case.segmentation[idx] == 2).astype(np.uint8)
            kept = loader.set_last_pred(true_tumor)
            if true_tumor.any() and g.max() > loader.filter_thresh:
                assert kept.sum() > 0 or not loader.last_info
        else:
            assert np.allclose(g, 0.5)
            loader.set_last_pred(np.zeros_like(case.segmentation[idx],
                                               dtype=np.uint8))
    assert guided_slices > 0
    # mirror merging: flip-equivariant check with a constant prob
    probs = np.tile(np.linspace(0, 1, feats["images"].shape[2])[None, None, :, None],
                    (4, feats["images"].shape[1], 1, 3)).astype(np.float32)
    # flip the mirrored entries the way the model would "see" them
    for i, axes in enumerate(loader.flips):
        p = probs[0]
        for ax in axes:
            p = np.flip(p, axis=ax - 1)
        probs[i] = p
    merged = loader.merge_mirrors(probs)
    np.testing.assert_allclose(merged, probs[0], atol=1e-6)


def test_fp_filtering_in_propagation(tmp_path):
    from boxsegliver_tpu.data import synthetic
    from boxsegliver_tpu.data.meta import load_meta, simulate_user_prior
    from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval
    from boxsegliver_tpu.interactive.propagation import GuidePropagationLoader

    root = synthetic.make_synthetic_dataset(tmp_path / "ds2", n_cases=1,
                                            shape=(12, 64, 64), k_split=1,
                                            with_features=False, seed=13)
    metas = load_meta(root)
    prior = simulate_user_prior(metas)
    case = parse_case_eval(metas[0], root, im_channel=3)
    args = argparse.Namespace(im_height=case.volume.shape[1],
                              im_width=case.volume.shape[2],
                              min_std=1.0, eval_discount=0.85,
                              random_flip=0, eval_mirror=False)
    loader = GuidePropagationLoader(case, prior[str(metas[0]["PID"])], args)
    for idx in loader.sweep("Forward"):
        loader.slice_features(idx)
        if loader.curr_info:
            # prediction with the true tumor + a far-away FP blob
            pred = (case.segmentation[idx] == 2).astype(np.uint8)
            pred[:3, :3] = 1
            kept = loader.set_last_pred(pred)
            assert kept[:3, :3].sum() == 0  # FP (no guide) removed
            break


def test_erode_iterations_equals_iterated_binary_erosion():
    """The one-pass city-block formulation is exactly iterated binary erosion
    with the cross structuring element, for both border conventions."""
    from scipy import ndimage as ndi

    from boxsegliver_tpu.interactive.clicks import erode_iterations

    rng = np.random.RandomState(0)
    cases = []
    blob = np.zeros((40, 48), np.uint8)
    blob[5:30, 8:40] = 1
    blob[12:18, 20:26] = 0
    cases.append(blob)
    cases.append((rng.rand(36, 36) > 0.35).astype(np.uint8))
    edge = np.zeros((24, 24), np.uint8)
    edge[0:10, 0:12] = 1  # touches the frame border
    cases.append(edge)
    cases.append(np.ones((16, 16), np.uint8))
    cases.append(np.zeros((16, 16), np.uint8))

    for mask in cases:
        for k in (1, 3, 7, 15):
            for bv in (0, 1):
                want = ndi.binary_erosion(mask, iterations=k, border_value=bv)
                got = erode_iterations(mask, k, border_value=bv)
                np.testing.assert_array_equal(got, want,
                                              err_msg=f"k={k} bv={bv}")
