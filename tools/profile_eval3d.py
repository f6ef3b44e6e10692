"""Profile UNet3D whole-volume inference on-chip (the PERF.md 3D eval
throughput path: 64x256x256, reference threed_script/201_unet_v1.sh config).

Decides whether the 16.1 volumes/min figure is memory-bound at the
C=30/60 stages (lane underfill, like the 2D case PERF.md documents) or
compute-bound — i.e., whether a fold-4 width packing of UNet3D's shallow
stages would pay.

Usage: python tools/profile_eval3d.py [--outdir /tmp/boxseg_profile_3d]
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
    ap.add_argument("--outdir", default="/tmp/boxseg_profile_3d")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--fast", action="store_true",
                    help="pred-mode + in-graph z-score + uint16 upload "
                         "(the make_volume_predict fast path)")
    ap.add_argument("--lane_pack", choices=["auto", "on", "off"],
                    default="auto",
                    help="width-packed shallow stages (models/packed3d.py)")
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax.core import FrozenDict

    from boxsegliver_tpu.models import build_model, load_model_config
    from boxsegliver_tpu.evaluators.volume3d import make_volume_predict
    from boxsegliver_tpu.train.trainer import TrainState

    kw = load_model_config("UNet3D")
    if opts.lane_pack != "auto":
        kw["lane_pack"] = opts.lane_pack == "on"
    model = build_model("UNet3D", model_kwargs=kw,
                        num_classes=2, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    if opts.fast:
        vol = {"images": (rs.rand(1, 64, 256, 256, 1) * 900)
               .astype(np.uint16)}
    else:
        vol = {"images": rs.rand(1, 64, 256, 256, 1).astype(np.float32)}
    init_feats = {"images": np.zeros((1, 64, 256, 256, 1), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), init_feats, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    predict = make_volume_predict(
        model, state, ret="pred" if opts.fast else "prob",
        in_zscore=opts.fast)

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    out = predict(vol)
    _ = np.asarray(out)[0, 0, 0, 0]  # real fetch (tunnel sync quirk)
    print(f"first call {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(opts.reps):
        out = predict(vol)
        _ = np.asarray(out)  # includes the product path's prob fetch
    dt = (time.perf_counter() - t0) / opts.reps
    print(f"{dt:.3f} s/volume incl fetch ({60 / dt:.1f} volumes/min)",
          flush=True)

    with jax.profiler.trace(opts.outdir):
        for _ in range(opts.reps):
            out = predict(vol)
            _ = np.asarray(out)
    for p in sorted(Path(opts.outdir).rglob("*.xplane.pb")):
        print(p, p.stat().st_size)


if __name__ == "__main__":
    main()
