"""Measure sliding-window 3D eval: host per-tile loop vs device-resident
tile scan (make_sliding_predict), UNet3D 64x256x256, patch (16,256,256),
overlap 0.5 (the PERF.md "Sliding window d=16" row).

Usage: python tools/bench_sliding3d.py --mode {host,dev} [--reps 4]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["host", "dev"], default="dev")
    ap.add_argument("--reps", type=int, default=4)
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax.core import FrozenDict

    from boxsegliver_tpu.evaluators.volume3d import (make_sliding_predict,
                                                     make_volume_predict,
                                                     sliding_window_3d)
    from boxsegliver_tpu.models import build_model, load_model_config
    from boxsegliver_tpu.ops.image_ops import zscore
    from boxsegliver_tpu.train.trainer import TrainState

    patch = (16, 256, 256)
    model = build_model("UNet3D", model_kwargs=load_model_config("UNet3D"),
                        num_classes=2, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    raw = (rs.rand(64, 256, 256) * 900).astype(np.uint16)
    init_feats = {"images": np.zeros((1,) + patch + (1,), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), init_feats, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))

    if opts.mode == "host":
        tile_fn = make_volume_predict(model, state)  # prob mode

        def run_once():
            norm = np.asarray(zscore(jnp.asarray(raw, jnp.float32)))[..., None]
            probs = sliding_window_3d(tile_fn, norm, patch, num_classes=2)
            return probs.argmax(-1).astype(np.uint8)
    else:
        predict = make_sliding_predict(model, state, patch, num_classes=2,
                                       ret="pred", in_zscore=True)

        def run_once():
            return np.asarray(predict(raw[..., None]))

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    out = run_once()
    print(f"first call {time.perf_counter() - t0:.1f}s "
          f"(pred sum {int(out.astype(np.int64).sum())})", flush=True)

    t0 = time.perf_counter()
    for _ in range(opts.reps):
        out = run_once()
        assert out.dtype == np.uint8  # run_once fetches to host (real sync)
    dt = (time.perf_counter() - t0) / opts.reps
    print(f"{opts.mode}: {dt:.3f} s/volume ({60 / dt:.1f} volumes/min)",
          flush=True)


if __name__ == "__main__":
    main()
