"""Synthetic LiTS-like dataset generator for tests and benchmarks.

The reference has no test suite and assumes the real LiTS download; we need an
always-available dataset with the same structure (HU volumes, organ label 1,
tumor label 2, meta.json schema) so every layer — extraction, sampling,
training, 3D eval — runs hermetically.  Cases are ellipsoid "livers" with
darker spherical "tumors" plus CT-like noise.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Tuple

import numpy as np

from boxsegliver_tpu.data import meta as meta_mod
from boxsegliver_tpu.data.kfold import read_or_create_k_folds


def make_case(rng: np.random.Generator, shape: Tuple[int, int, int] = (32, 128, 128),
              max_tumors: int = 3):
    """One synthetic case → (HU volume int16, labels uint8, spacing)."""
    d, h, w = shape
    zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w), indexing="ij")

    # Ellipsoid liver somewhere center-ish
    cz = rng.uniform(0.4, 0.6) * d
    cy = rng.uniform(0.4, 0.6) * h
    cx = rng.uniform(0.4, 0.6) * w
    rz = rng.uniform(0.25, 0.4) * d
    ry = rng.uniform(0.25, 0.4) * h
    rx = rng.uniform(0.25, 0.4) * w
    liver = (((zz - cz) / rz) ** 2 + ((yy - cy) / ry) ** 2
             + ((xx - cx) / rx) ** 2) <= 1.0

    labels = np.zeros(shape, np.uint8)
    labels[liver] = 1

    n_tumors = int(rng.integers(1, max_tumors + 1))
    for _ in range(n_tumors):
        # tumor center inside the liver ellipsoid
        tz = cz + rng.uniform(-0.5, 0.5) * rz
        ty = cy + rng.uniform(-0.5, 0.5) * ry
        tx = cx + rng.uniform(-0.5, 0.5) * rx
        tr = rng.uniform(0.08, 0.2) * min(h, w)
        tumor = ((zz - tz) ** 2 + (yy - ty) ** 2 + (xx - tx) ** 2) <= tr ** 2
        labels[tumor & liver] = 2

    volume = np.full(shape, -200.0, np.float32)           # background fat-ish
    volume += rng.normal(0.0, 15.0, shape).astype(np.float32)
    volume[labels == 1] = 60.0                             # liver parenchyma
    volume[labels == 2] = 20.0                             # hypodense tumor
    volume += rng.normal(0.0, 10.0, shape).astype(np.float32)
    spacing = (float(rng.uniform(1.0, 3.0)), 0.8, 0.8)
    return volume.astype(np.int16), labels, spacing


def make_nf_case(rng: np.random.Generator,
                 shape: Tuple[int, int, int] = (32, 128, 128),
                 max_lesions: int = 4):
    """One synthetic NF-like MRI case: bright lesions (label 1) on a gray body
    background, value range [0, 1000] (reference NF gray range,
    NF/input_pipeline.py:45-46)."""
    d, h, w = shape
    zz, yy, xx = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    cz, cy, cx = 0.5 * d, 0.5 * h, 0.5 * w
    body = (((zz - cz) / (0.45 * d)) ** 2 + ((yy - cy) / (0.4 * h)) ** 2
            + ((xx - cx) / (0.4 * w)) ** 2) <= 1.0
    labels = np.zeros(shape, np.uint8)
    for _ in range(int(rng.integers(1, max_lesions + 1))):
        tz = cz + rng.uniform(-0.5, 0.5) * 0.45 * d
        ty = cy + rng.uniform(-0.5, 0.5) * 0.4 * h
        tx = cx + rng.uniform(-0.5, 0.5) * 0.4 * w
        tr = rng.uniform(0.08, 0.18) * min(h, w)
        lesion = ((zz - tz) ** 2 + (yy - ty) ** 2 + (xx - tx) ** 2) <= tr ** 2
        labels[lesion & body] = 1
    volume = np.zeros(shape, np.float32)
    volume[body] = 300.0
    volume[labels == 1] = 700.0                            # hyperintense NF
    volume += rng.normal(0.0, 30.0, shape).astype(np.float32) * body
    spacing = (float(rng.uniform(3.0, 6.0)), 1.0, 1.0)
    return np.clip(volume, 0, 1000).astype(np.int16), labels, spacing


def make_synthetic_dataset(root, n_cases: int = 4,
                           shape: Tuple[int, int, int] = (32, 128, 128),
                           seed: int = 0, k_split: int = 4,
                           with_features: bool = True,
                           modality: str = "liver") -> Path:
    """Write a ready-to-train dataset: npy cache + meta.json + k_folds.txt +
    hist features + prior.json, mirroring the reference's prepare/ layout.
    modality='nf' writes NF-like MRI (lesion label 1, gray range [0,1000])."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    preset = meta_mod.MODALITIES[modality]
    metas = []
    for pid in range(n_cases):
        if modality == "nf":
            volume, labels, spacing = make_nf_case(rng, shape)
        else:
            volume, labels, spacing = make_case(rng, shape)
        m = meta_mod.process_case(volume, labels, spacing, pid,
                                  f"synthetic://volume-{pid}",
                                  f"synthetic://segmentation-{pid}",
                                  tumor_value=preset["tumor_value"])
        case_dir = root / f"volume-{pid}"
        case_dir.mkdir(parents=True, exist_ok=True)
        np.save(case_dir / "volume.npy",
                meta_mod.window_clip_uint16(volume, preset["gray_min"],
                                            preset["gray_max"]))
        np.save(case_dir / "segmentation.npy", labels)
        metas.append(m)
    with (root / "meta.json").open("w") as f:
        json.dump(metas, f)
    read_or_create_k_folds(root / "k_folds.txt", [m["PID"] for m in metas],
                           k_split=k_split, seed=1357)
    if with_features:
        if modality == "liver":  # hist context is a CT/LiTS feature
            meta_mod.dump_hist_features(root)
        meta_mod.simulate_user_prior(metas, root / "prior.json")
    return root
