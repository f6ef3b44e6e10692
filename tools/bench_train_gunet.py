"""Flagship GUNet(ctx+sp) 256^2 training throughput on one chip.

The signature config of the framework (reference
run_scripts/template/002_gnet_sp.sh: GUNet with histogram context +
spatial guide, 256x256x3, instance norm) measured with bench.py's
methodology: AOT compile, amortized timing windows, bulk metric drain
(the tunnel's per-dispatch floor and block_until_ready quirk make naive
timing meaningless — see PERF.md). Runs the REAL product composition
(`build_trainer(fuse_preprocess=True)` + the guided liver pipeline), not
a stripped model loop.

Usage: python tools/bench_train_gunet.py [--lane_pack auto|on|off]
       [--batch 8] [--steps 20] [--windows 3] [--size 256]

NOTE: first compile of the fused lane-packed GUNet ctx+sp step took
~22 min over the tunnel in round 3 — run detached with the compile
cache enabled (ensure_compile_cache() below sets it up).
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


def gunet_dataset_root(size: int) -> Path:
    """Synthetic guided-liver dataset for the flagship config (created on
    first use; shared with tools/profile_step.py --config gunet)."""
    from boxsegliver_tpu.data import synthetic

    ds_root = Path(f"/tmp/boxseg_benchg_ds_{size}")
    if not (ds_root / "meta.json").exists():
        synthetic.make_synthetic_dataset(ds_root, n_cases=4,
                                         shape=(24, size, size),
                                         k_split=4, with_features=True)
    return ds_root


def gunet_args(size: int, batch: int, lane_pack: str = "auto",
               moment_dtype: str = "float32",
               model_dir: str = "/tmp/boxseg_benchg_model"):
    """The run_scripts/template/002_gnet_sp.sh train flag surface (the
    flagship GUNet ctx+sp config) as parsed product args."""
    from boxsegliver_tpu.cli.main import get_args

    args = get_args([
        "liver", "--mode", "train", "--tag", "benchg",
        "--model", "GUNet", "--classes", "Liver", "Tumor",
        "--im_height", str(size), "--im_width", str(size),
        "--im_channel", "3", "--random_flip", "3",
        "--normalizer", "instance_norm",
        "--use_context", "--context_list", "hist", "200", "--hist_noise",
        "--use_spatial", "--spatial_random", "1.0",
        "--spatial_inner_random",
        "--center_random_ratio", "0.2", "--stddev_random_ratio", "0.4",
        "--min_std", "2", "--noise_scale", "0.05",
        "--loss_weight_type", "numerical",
        "--loss_numeric_w", "0.2", "0.4", "4.4",
        "--batch_size", str(batch),
        "--weight_decay_rate", "0.000001",
        "--learning_rate", "0.001",
        "--num_of_total_steps", "1000000",
        "--test_fold", "0", "--k_folds", "4",
        "--model_dir", model_dir, "--host_workers", "1",
        "--log_step", "1000000", "--lane_pack", lane_pack,
        "--opt_moment_dtype", moment_dtype,
    ])
    args.num_replicas = 1
    return args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane_pack", choices=["auto", "on", "off"],
                    default="auto")
    ap.add_argument("--size", type=int, default=256,
                    help="in-plane resolution (256 = the product config; "
                         "smaller only for CPU smokes)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--moment_dtype", choices=["float32", "bfloat16"],
                    default="float32")
    ap.add_argument("--cache", choices=["on", "off"], default="on",
                    help="HBM volume cache (the product --device_cache "
                         "path); off = the round-4 host-fed measurement")
    opts = ap.parse_args()

    import jax

    from boxsegliver_tpu.cli.main import build_trainer
    from boxsegliver_tpu.data.pipeline import TrainDataset
    from boxsegliver_tpu.data.sampler import TrainSampler

    ds_root = gunet_dataset_root(opts.size)
    args = gunet_args(opts.size, opts.batch, opts.lane_pack,
                      opts.moment_dtype)

    cache = None
    if opts.cache == "on":
        # HBM volume cache, exactly like the UNet headline bench / the CLI's
        # --device_cache: the round-5 GUNet profile showed the flagship was
        # HOST-INPUT-bound (85.5 ms device self time vs 240 ms wall at bs 32)
        # — volumes cached on device turn the host batch into tiny indices +
        # guide moments, and the fused preprocess gathers/renders on device.
        from boxsegliver_tpu.data.device_cache import DeviceVolumeCache
        from boxsegliver_tpu.data.kfold import (LITS_SEED,
                                                read_or_create_k_folds,
                                                train_test_split)
        from boxsegliver_tpu.data.meta import load_meta
        from boxsegliver_tpu.parallel import make_mesh
        metas = load_meta(ds_root)
        folds = read_or_create_k_folds(ds_root / "k_folds.txt",
                                       [m["PID"] for m in metas],
                                       k_split=args.k_folds, seed=LITS_SEED)
        train_pids, _ = train_test_split(folds, args.test_fold)
        cache = DeviceVolumeCache(ds_root, [int(p) for p in train_pids],
                                  mesh=make_mesh(1),
                                  budget_gb=args.device_cache_gb)

    trainer = build_trainer(args, ds_root, fuse_preprocess=True, cache=cache)
    sampler = TrainSampler(ds_root, args, mode="train", seed=1,
                           zbase=cache.zbase if cache else None)
    dataset = TrainDataset(sampler, args, seed=args.seed, raw=True,
                           workers=1, prefetch=4)
    it = iter(dataset)
    drain_every = int(args.metrics_fetch_steps)

    batch0 = next(it)
    feats0 = jax.device_put(batch0, trainer._data_sharding)
    rng0 = jax.random.PRNGKey(0)
    t_c0 = time.perf_counter()
    compiled = trainer._train_step.lower(trainer.state, feats0, None,
                                         rng0).compile()
    compile_s = time.perf_counter() - t_c0
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
    slices_s = opts.steps * opts.batch / med
    print(json.dumps({
        "metric": "gunet_ctx_sp_train_throughput",
        "value": round(slices_s, 2),
        "unit": f"slices({opts.size}x{opts.size}x3)/s/chip",
        "ms_per_step": round(1e3 * med / opts.steps, 2),
        "lane_pack": opts.lane_pack,
        "moment_dtype": opts.moment_dtype,
        "batch": opts.batch,
        "cache": opts.cache,
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
