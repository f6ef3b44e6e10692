"""Generate tests/fixtures/geometry_golden.npz by EXECUTING the reference's
eval-loader geometry code (parse_case_eval) on synthetic cases.

The reference module (DataLoader/Liver/input_pipeline_g.py) cannot be
imported here (TF1 contrib deps), so the parse_case_eval function SOURCE is
extracted with ast and exec'd with its module constants (GRAY_MIN=-200,
GRAY_MAX=250, input_pipeline_g.py:46-47) and an nii_kits stub that serves the
synthetic volumes — the geometry/normalization arithmetic that runs is the
reference's own, line for line.

Cases cover the edge behaviors VERDICT round 2 called out: align-16 re-crop,
±25 xy padding, z-channel edge padding (z1 < lhc, z2 + rhc > depth), and
border-clamped bboxes.

Usage: python tools/gen_geometry_golden.py   (writes the .npz fixture)
"""

from __future__ import annotations

import ast
import math
import sys
from pathlib import Path

import numpy as np

REF_PIPE = Path("/root/reference/DataLoader/Liver/input_pipeline_g.py")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / \
    "geometry_golden.npz"


NF_PIPE = Path("/root/reference/DataLoader/NF/input_pipeline_g.py")


def _extract(pipe_path: Path, extra_ns=None):
    """exec the reference parse_case_eval of a pipeline file in a stubbed
    namespace; returns (fn, volumes dict served by the nii stub)."""
    tree = ast.parse(pipe_path.read_text())
    src = None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "parse_case_eval":
            src = ast.get_source_segment(pipe_path.read_text(), node)
    if src is None:
        raise SystemExit(f"parse_case_eval not found in {pipe_path}")

    volumes = {}

    class NiiStub:
        @staticmethod
        def read_lits(obj_num, kind, path):
            return None, volumes[(obj_num, kind)]

        @staticmethod
        def read_nii(path):
            # the NF loader reads by path: serve vol/lab by name
            kind = "vol" if "volume" in str(path) else "lab"
            return None, volumes[(7, kind)]

    ns = {"math": math, "np": np, "nii_kits": NiiStub,
          "PROJ_ROOT": Path("/nonexistent"), "Path": Path, "print": print}
    ns.update(extra_ns or {})
    exec(compile(src, str(pipe_path), "exec"), ns)
    return ns["parse_case_eval"], volumes


def extract_reference_fn():
    return _extract(REF_PIPE, {"GRAY_MIN": -200, "GRAY_MAX": 250})


def main():
    ref_fn, volumes = extract_reference_fn()
    rng = np.random.RandomState(20260817)

    # (name, size, organ bbox [z1,y1,x1,z2p,y2p,x2p], im_channel)
    cases = [
        # interior bbox, sizes needing align-16 growth
        ("interior", (24, 120, 104), [6, 30, 25, 18, 80, 70], 3),
        # bbox touching xy borders: padding + align clamp at 0.  (NOTE: a
        # bbox whose padded+aligned size exceeds the image hits the
        # reference's "align failed" path, which leaves y1/x1 NEGATIVE and
        # silently wraps the numpy crop to a degenerate sliver
        # (input_pipeline_g.py:869-874) — our loader clamps to 0 instead;
        # deviation documented in evaluators/eval_loader.py.)
        ("border_xy", (20, 96, 96), [3, 4, 6, 18, 90, 92], 3),
        # z range requiring left channel pad (z1=0 < lhc) and right pad
        ("zpad", (10, 64, 64), [0, 10, 10, 10, 50, 50], 5),
        # tall thin organ, odd paddings
        ("thin", (16, 128, 64), [3, 20, 20, 14, 110, 30], 3),
        # single-channel network
        ("c1", (12, 96, 96), [2, 30, 30, 10, 60, 60], 1),
    ]

    out = {}
    for name, size, bbox, c in cases:
        d, h, w = size
        vol = rng.randint(-1024, 2048, size=size).astype(np.int16)
        seg = (rng.rand(*size) < 0.1).astype(np.uint8) * \
            rng.randint(1, 3, size=size).astype(np.uint8)
        volumes[(7, "vol")] = vol
        volumes[(7, "lab")] = seg
        case = {"size": list(size), "bbox": list(bbox), "PID": 7,
                "vol_case": "volume-7.nii", "lab_case": "segmentation-7.nii"}
        pid, _, _, rbbox, oshape, cshape, lhc, rhc, rvol, rseg = ref_fn(
            case, 16, 25, 0, c, parse_label=True)
        out[f"{name}_in_vol"] = vol
        out[f"{name}_in_seg"] = seg
        out[f"{name}_meta"] = np.asarray(list(size) + list(bbox) + [c])
        out[f"{name}_bbox"] = np.asarray(rbbox)      # [x1,y1,z1,x2-1,y2-1,z2-1]
        out[f"{name}_cshape"] = np.asarray(cshape)   # [cd, ch, cw]
        out[f"{name}_lr"] = np.asarray([lhc, rhc])
        # normalized values are (clip(HU,-200,250)+200)/450: store exactly as
        # int16 numerators to keep the fixture small
        out[f"{name}_volume450"] = np.round(rvol * 450).astype(np.int16)
        out[f"{name}_seg"] = rseg

    # ---- NF loader (whole-frame, clip / unmasked per-slice z-score) -------
    nf_fn, nf_vols = _extract(NF_PIPE)
    for zs in (False, True):
        name = "nf_zscore" if zs else "nf_clip"
        size = (10, 64, 64)
        # raw values within the NF gray range [0, 1000] (the declared NF
        # window, reference NF/input_pipeline.py:45-46) — the npy cache
        # stores that window, so values beyond it are an extraction-time
        # clip, not an eval-loader property
        vol = rng.randint(0, 1001, size=size).astype(np.int16)
        vol[:, :8, :] = 0          # background rows exercise the zero mask
        vol[3] = 0                 # an empty slice
        seg = (rng.rand(*size) < 0.15).astype(np.uint8)
        nf_vols[(7, "vol")] = vol
        nf_vols[(7, "lab")] = seg
        case = {"size": list(size), "PID": 7,
                "vol_case": "volume-7.nii", "lab_case": "segmentation-7.nii"}
        pid, _, _, oshape, cshape, lhc, rhc, rvol, rseg = nf_fn(
            case, 3, parse_label=True, z_score=zs)
        out[f"{name}_in_vol"] = vol
        out[f"{name}_in_seg"] = seg
        out[f"{name}_cshape"] = np.asarray(cshape)
        out[f"{name}_lr"] = np.asarray([lhc, rhc])
        # (y, x, z) float32; z-scored values are not integer-exact — store f32
        out[f"{name}_volume"] = rvol.astype(np.float32)
        out[f"{name}_seg"] = rseg
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes), "
          f"{len(cases)} cases")


if __name__ == "__main__":
    main()
