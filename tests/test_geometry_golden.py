"""Eval-loader geometry goldens: our parse_case_eval/slice_batches vs the
reference's parse_case_eval (executed reference code, see
tools/gen_geometry_golden.py) — align-16 crop, ±25 xy padding, channel-edge
z-padding, window normalization (BASELINE.md output-parity axis, geometry
half; cli/compare_preds.py is the prediction half)."""

from pathlib import Path

import numpy as np
import pytest

from boxsegliver_tpu.data.meta import window_clip_uint16
from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval, slice_batches

FIX = Path(__file__).parent / "fixtures"
CASES = ["interior", "border_xy", "zpad", "thin", "c1"]


@pytest.fixture(scope="module")
def g():
    return np.load(FIX / "geometry_golden.npz")


def _write_cache(g, name, root):
    meta = g[f"{name}_meta"]
    size, bbox, c = meta[:3], meta[3:9], int(meta[9])
    case_dir = root / "volume-7"
    case_dir.mkdir(parents=True, exist_ok=True)
    np.save(case_dir / "volume.npy", window_clip_uint16(g[f"{name}_in_vol"]))
    np.save(case_dir / "segmentation.npy", g[f"{name}_in_seg"])
    case_meta = {"PID": 7, "size": [int(v) for v in size],
                 "bbox": [int(v) for v in bbox],
                 "spacing": [1.0, 0.8, 0.8]}
    return case_meta, c


@pytest.mark.parametrize("name", CASES)
def test_parse_case_eval_geometry_golden(g, name, tmp_path):
    case_meta, c = _write_cache(g, name, tmp_path)
    case = parse_case_eval(case_meta, tmp_path, im_channel=c)

    # reference bbox is [x1, y1, z1, x2-1, y2-1, z2-1]
    rx1, ry1, rz1, rx2, ry2, rz2 = g[f"{name}_bbox"]
    assert case.crop == (rz1, rz2 + 1, ry1, ry2 + 1, rx1, rx2 + 1)
    assert (case.lhc, case.rhc) == tuple(g[f"{name}_lr"])
    assert case.volume.shape == tuple(g[f"{name}_cshape"])

    # reference volume is (y, x, z) in [0,1] with exact values k/450
    ref_vol = g[f"{name}_volume450"].astype(np.float32) / 450.0
    ref_zyx = np.transpose(ref_vol, (2, 0, 1))
    np.testing.assert_allclose(case.volume, ref_zyx, atol=1e-6)
    np.testing.assert_array_equal(case.segmentation, g[f"{name}_seg"])


def test_slice_batches_reassembly_golden(g):
    """Batch padding + 2.5D channel stacking: batches must tile the
    reference-cropped volume exactly (get_dataset_for_eval_image,
    input_pipeline_g.py:944-960)."""
    import tempfile

    name = "zpad"
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        case_meta, c = _write_cache(g, name, root)
        case = parse_case_eval(case_meta, root, im_channel=c)
        ref_vol = np.transpose(
            g[f"{name}_volume450"].astype(np.float32) / 450.0, (2, 0, 1))
        cz = case.depth
        bs = 4
        ph, pw = case.volume.shape[1:]
        batches = list(slice_batches(case, bs, (ph, pw)))
        pads = (bs - cz % bs) % bs
        assert len(batches) == (cz + pads) // bs
        assert batches[-1]["pads"] == pads
        for b, batch in enumerate(batches):
            for j in range(bs):
                z = b * bs + j
                img = batch["images"][j]
                if z < cz:
                    # channel k holds cropped-volume slice z + k (the volume
                    # already carries the lhc/rhc halo)
                    for k in range(c):
                        np.testing.assert_allclose(img[..., k], ref_zyx_at(
                            ref_vol, z + k), atol=1e-6)
                else:
                    assert not img.any()


def ref_zyx_at(vol, z):
    return vol[z]


@pytest.mark.parametrize("norm", ["nf_clip", "nf_zscore"])
def test_nf_parse_case_eval_golden(g, norm, tmp_path):
    """NF whole-frame loader vs the reference NF parse_case_eval
    (NF/input_pipeline_g.py:691-719): clip(0,900)/900 and the UNMASKED
    per-slice z-score (background zeros become -mean/std — the reference's
    eval-side convention, distinct from its masked train z-score)."""
    from boxsegliver_tpu.data.meta import window_clip_uint16

    in_vol = g[f"{norm}_in_vol"]
    case_dir = tmp_path / "volume-7"
    case_dir.mkdir(parents=True)
    np.save(case_dir / "volume.npy",
            window_clip_uint16(in_vol, gray_min=0, gray_max=1000))
    np.save(case_dir / "segmentation.npy", g[f"{norm}_in_seg"])
    meta = {"PID": 7, "size": [int(v) for v in in_vol.shape],
            "bbox": [0, 0, 0] + [int(v) for v in in_vol.shape],
            "spacing": [3.0, 1.0, 1.0]}
    case = parse_case_eval(meta, tmp_path, im_channel=3, norm=norm,
                           whole_frame=True)
    assert (case.lhc, case.rhc) == tuple(g[f"{norm}_lr"])
    ref = np.transpose(g[f"{norm}_volume"], (2, 0, 1))  # (y,x,z) -> (z,y,x)
    ours = case.volume[case.lhc:case.lhc + case.depth]
    if norm == "nf_zscore":
        # DOCUMENTED DEVIATION: a fully-empty slice makes the reference
        # divide by NaN statistics (RuntimeWarning in their code) and emit a
        # NaN slice; our loader leaves it at 0.
        empty = ~np.any(g[f"{norm}_in_vol"] > 0, axis=(1, 2))
        assert np.isnan(ref[empty]).all()
        assert (ours[empty] == 0).all()
        np.testing.assert_allclose(ours[~empty], ref[~empty],
                                   rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(
        np.clip(case.segmentation, 0, 1), g[f"{norm}_seg"])
