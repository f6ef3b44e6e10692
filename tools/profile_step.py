"""Capture a jax.profiler trace of the headline product train step on-chip.

Runs the exact bench.py workload (cli.main.build_trainer(fuse_preprocess=True)
product step, UNet 2D 256x256 bs=32) for a few steps inside
jax.profiler.trace, writing an xplane to --outdir.  The companion
tools/parse_profile.py turns the xplane into a per-op time/bytes table; this
split exists because capture must run against the real TPU (minutes of remote
compile) while parsing is host-only.

Usage:  python tools/profile_step.py [--steps 8] [--outdir /tmp/boxseg_profile]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--outdir", default="/tmp/boxseg_profile")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--config", choices=["unet", "gunet"], default="unet",
                    help="unet = the headline bench workload; gunet = the "
                         "flagship ctx+sp config (tools/bench_train_gunet "
                         "arg surface, guided pipeline, no device cache)")
    opts = ap.parse_args()

    import jax

    import bench
    from boxsegliver_tpu.cli.main import build_trainer
    from boxsegliver_tpu.data import synthetic
    from boxsegliver_tpu.data.device_cache import DeviceVolumeCache
    from boxsegliver_tpu.data.kfold import (LITS_SEED, read_or_create_k_folds,
                                            train_test_split)
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.data.pipeline import TrainDataset
    from boxsegliver_tpu.data.sampler import TrainSampler
    from boxsegliver_tpu.parallel import make_mesh

    if opts.config == "gunet":
        from tools.bench_train_gunet import gunet_args, gunet_dataset_root
        ds_root = gunet_dataset_root(256)
        args = gunet_args(256, opts.batch_size,
                          model_dir="/tmp/boxseg_profileg_model")
        metas = load_meta(ds_root)
        folds = read_or_create_k_folds(ds_root / "k_folds.txt",
                                       [m["PID"] for m in metas],
                                       k_split=args.k_folds, seed=LITS_SEED)
        train_pids, _ = train_test_split(folds, args.test_fold)
        cache = DeviceVolumeCache(ds_root, [int(p) for p in train_pids],
                                  mesh=make_mesh(1),
                                  budget_gb=args.device_cache_gb)
        trainer = build_trainer(args, ds_root, fuse_preprocess=True,
                                cache=cache)
        sampler = TrainSampler(ds_root, args, mode="train", seed=1,
                               zbase=cache.zbase)
        dataset = TrainDataset(sampler, args, seed=args.seed, raw=True,
                               workers=1, prefetch=4)
        _profile(opts, args, trainer, dataset)
        return

    ds_root = Path("/tmp/boxseg_bench_ds")
    if not (ds_root / "meta.json").exists():
        synthetic.make_synthetic_dataset(ds_root, n_cases=4,
                                         shape=(24, 512, 512), k_split=4,
                                         with_features=False)
    args = bench.product_args("/tmp/boxseg_profile_model")
    args.batch_size = opts.batch_size
    args.num_replicas = 1

    metas = load_meta(ds_root)
    folds = read_or_create_k_folds(ds_root / "k_folds.txt",
                                   [m["PID"] for m in metas],
                                   k_split=args.k_folds, seed=LITS_SEED)
    train_pids, _ = train_test_split(folds, args.test_fold)
    cache = DeviceVolumeCache(ds_root, [int(p) for p in train_pids],
                              mesh=make_mesh(1), budget_gb=args.device_cache_gb)
    trainer = build_trainer(args, ds_root, fuse_preprocess=True, cache=cache)
    sampler = TrainSampler(ds_root, args, mode="train", seed=1,
                           zbase=cache.zbase)
    dataset = TrainDataset(sampler, args, seed=args.seed, raw=True,
                           workers=1, prefetch=4)
    _profile(opts, args, trainer, dataset)


def _profile(opts, args, trainer, dataset):
    import jax

    it = iter(dataset)

    batch0 = next(it)
    feats0 = jax.device_put(batch0, trainer._data_sharding)
    rng0 = jax.random.PRNGKey(0)
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    compiled = trainer._train_step.lower(trainer.state, feats0, None,
                                         rng0).compile()
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    # Dump the optimized HLO so parse_profile --hlo can resolve hlo_stats op
    # names (fusion.394, ...) to their fusion bodies' source metadata.
    try:
        Path(opts.outdir).mkdir(parents=True, exist_ok=True)
        hlo_path = Path(opts.outdir) / "compiled_hlo.txt"
        hlo_path.write_text(compiled.as_text())
        print(f"wrote {hlo_path}", flush=True)
    except Exception as e:  # pragma: no cover - best effort
        print(f"HLO dump failed: {e}", flush=True)

    state = trainer.state
    pending = []
    for _ in range(opts.warmup):
        batch = next(it)
        feats = jax.device_put(batch, trainer._data_sharding)
        state, metrics = compiled(state, feats, None, rng0)
        pending.append(metrics)
    jax.device_get(pending)

    print("tracing...", flush=True)
    with jax.profiler.trace(opts.outdir):
        pending = []
        t0 = time.perf_counter()
        for _ in range(opts.steps):
            batch = next(it)
            feats = jax.device_put(batch, trainer._data_sharding)
            state, metrics = compiled(state, feats, None, rng0)
            pending.append(metrics)
        jax.device_get(pending)
        dt = time.perf_counter() - t0
    print(f"traced {opts.steps} steps in {dt:.3f}s "
          f"({opts.steps * args.batch_size / dt:.1f} slices/s)", flush=True)
    dataset.close()
    for p in sorted(Path(opts.outdir).rglob("*")):
        if p.is_file():
            print(p, p.stat().st_size)


if __name__ == "__main__":
    main()
