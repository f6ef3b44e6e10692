"""3D training throughput: the product `nf_3d` train step (UNet3D patches)
on one chip, with the packed3d lane layout on/off.

Measures the same composition `cli.main nf_3d --mode train` runs
(build_trainer(fuse_preprocess=True) + Sampler3D + TrainDataset(raw=True)),
with the AOT-compile + amortized-window + bulk-metric-drain methodology of
bench.py (the tunnel's per-dispatch floor and sync quirk make naive timing
meaningless — see PERF.md).

Usage: python tools/bench_train3d.py [--lane_pack auto|on|off]
       [--depth 16] [--batch 4] [--steps 20] [--windows 3]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane_pack", choices=["auto", "on", "off"],
                    default="auto")
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--size", type=int, default=256,
                    help="in-plane resolution (256 = the product config; "
                         "smaller only for CPU smokes)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    opts = ap.parse_args()

    import jax

    from boxsegliver_tpu.cli.main import build_trainer, get_args
    from boxsegliver_tpu.data import synthetic
    from boxsegliver_tpu.data.pipeline import TrainDataset
    from boxsegliver_tpu.data.sampler3d import Sampler3D

    ds_root = Path(f"/tmp/boxseg_bench3d_ds_{opts.size}")
    if not (ds_root / "meta.json").exists():
        synthetic.make_synthetic_dataset(ds_root, n_cases=4,
                                         shape=(24, opts.size, opts.size),
                                         k_split=4, with_features=False)

    # the run_scripts/threed/201_unet_v1.sh flag surface (d/bs overridable)
    args = get_args([
        "nf_3d", "--mode", "train", "--tag", "bench3d",
        "--model", "UNet3D", "--classes", "NF",
        "--im_height", str(opts.size), "--im_width", str(opts.size),
        "--im_channel", "1",
        "--im_depth", str(opts.depth), "--batch_size", str(opts.batch),
        "--random_flip", "7", "--test_fold", "0", "--k_folds", "4",
        "--num_of_total_steps", "1000000",
        "--model_dir", "/tmp/boxseg_bench3d_model", "--host_workers", "1",
        "--log_step", "1000000", "--lane_pack", opts.lane_pack,
    ])
    args.num_replicas = 1

    trainer = build_trainer(args, ds_root, fuse_preprocess=True)
    sampler = Sampler3D(ds_root, args, mode="train", seed=1)
    dataset = TrainDataset(sampler, args, seed=args.seed, raw=True,
                           workers=1, prefetch=4)
    it = iter(dataset)
    drain_every = int(args.metrics_fetch_steps)

    batch0 = next(it)
    feats0 = jax.device_put(batch0, trainer._data_sharding)
    rng0 = jax.random.PRNGKey(0)
    compiled = trainer._train_step.lower(trainer.state, feats0, None,
                                         rng0).compile()
    state = trainer.state

    def run_window(n, state):
        pending = []
        t0 = time.perf_counter()
        for _ in range(n):
            batch = next(it)
            feats = jax.device_put(batch, trainer._data_sharding)
            state, metrics = compiled(state, feats, None, rng0)
            pending.append(metrics)
            if len(pending) >= drain_every:
                jax.device_get(pending)
                pending = []
        if pending:
            jax.device_get(pending)
        return time.perf_counter() - t0, state

    _, state = run_window(3, state)  # warmup
    windows = []
    for _ in range(opts.windows):
        dt, state = run_window(opts.steps, state)
        windows.append(dt)
    med = statistics.median(sorted(windows))
    patches_s = opts.steps * opts.batch / med
    print(json.dumps({
        "metric": "unet3d_train_patches_per_s",
        "value": round(patches_s, 2),
        "unit": f"patches({opts.depth}x{opts.size}x{opts.size})/s/chip",
        "ms_per_step": round(1e3 * med / opts.steps, 2),
        "slices_equiv_per_s": round(patches_s * opts.depth, 1),
        "lane_pack": opts.lane_pack,
        "batch": opts.batch,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
