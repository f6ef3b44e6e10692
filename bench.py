"""Training throughput benchmark (driver-run on the real TPU chip).

Workload: the reference's headline config — UNet 2D on LiTS-like 256x256x3
slices (reference run_scripts/template/001_unet.sh) — measured on the PRODUCT
train path: cli.main.build_trainer(fuse_preprocess=True) + TrainDataset(raw=True),
i.e. the exact compiled step and loop body `python -m boxsegliver_tpu.cli.main
liver --mode train` executes (host class-balanced sampling, one fused compiled
step per iteration: device-side augmentation + forward + backward + update,
bf16 activations, bulk metric drain every 16 steps).

Synchronization: this TPU tunnel's `block_until_ready` returns before device
execution completes (verified: it "times" an 8192^3 matmul at >20 PFLOP/s), so
each window is closed by an actual host fetch (device_get of the window's
metrics — which the product loop performs anyway as its metric drain).

Reported value is the MEDIAN of the windows; best is included alongside.
vs_baseline uses BASELINE.json's "5000 slices/sec on v5e-8" read as per-slice
(625/chip): the per-chip physical roofline of this model is ~694 slices/s
(283.6 GFLOP/slice fwd+bwd at 197 bf16 TFLOP/s peak), so the 5000-per-chip
reading would be 7.2x over the speed of light — see PERF.md for the full
roofline analysis and achieved MFU.
"""

from __future__ import annotations

import json
import os
import statistics
import time
from pathlib import Path

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()

# batch amortizes the latency-bound tail fusions; measured on-chip
# (round-4 A/B matrix, PERF.md): 32 → 374.8, 64 → 378.0, 128 → 379.6
BATCH_SIZE = int(os.environ.get("BENCH_BATCH_SIZE", "128"))
STEPS = int(os.environ.get("BENCH_STEPS", "16"))
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "6"))
# K>1 fuses K train steps into one lax.scan dispatch (--steps_per_dispatch,
# the TPU host-loop pattern) — A/B: BENCH_STEPS_PER_DISPATCH=8 python bench.py
SPD = int(os.environ.get("BENCH_STEPS_PER_DISPATCH", "1"))
BASELINE_PER_CHIP = 5000.0 / 8.0
PEAK_BF16_TFLOPS = 197.0  # TPU v5e (device_kind "TPU v5 lite")
METRIC = "unet2d_train_throughput_256x256"
# Architecture-honest compute bound for THIS network on v5e: 64-channel 3x3
# convs half-fill the 128-wide MXU in any formulation, so ~72 GFLOP/slice run
# at an effective 98.5 TFLOP/s and the rest at 197 -> 1.80 ms/slice floor.
# Derivation + per-op profiler evidence: PERF.md "Why the remaining gap is
# architectural" + profiles/.
CEILING_SPS = 555.0


def product_args(model_dir: str):
    """The real CLI flag surface for the headline workload
    (run_scripts/template/001_unet.sh equivalent)."""
    from boxsegliver_tpu.cli.main import get_args
    return get_args([
        "liver", "--mode", "train", "--tag", "bench",
        "--model", "UNet", "--classes", "Liver", "Tumor",
        "--batch_size", str(BATCH_SIZE), "--im_channel", "3",
        "--noise_scale", "0.1", "--random_flip", "3",
        "--test_fold", "0", "--k_folds", "4",
        "--num_of_total_steps", "1000000",
        "--model_dir", model_dir, "--host_workers", "1",
        "--log_step", "1000000", "--device_cache",
        # A/B hook for the optimizer-traffic experiment (PERF.md):
        # BENCH_MOMENT_DTYPE=bfloat16 python bench.py
        "--opt_moment_dtype", os.environ.get("BENCH_MOMENT_DTYPE", "float32"),
        "--steps_per_dispatch", str(SPD),
        # A/B hook: BENCH_METRICS_EVERY=1 restores every-step train-metric
        # compute (round-5 default is the reference cost model: metrics only
        # on log-step-fetched steps, lax.cond-gated — see trainer.py)
        "--metrics_train_steps", os.environ.get("BENCH_METRICS_EVERY", "0"),
    ])


def _probe_devices(metric: str = METRIC, unit: str = "slices/sec/chip",
                   timeout_s: float = 120.0):
    """Fail fast (with the bench's JSON contract) when the backend hangs."""
    from boxsegliver_tpu.utils.compile_cache import probe_devices
    try:
        return probe_devices(timeout_s)
    except RuntimeError as e:
        print(json.dumps({
            "metric": metric, "value": None,
            "unit": unit, "vs_baseline": None,
            "error": f"{e} — last committed measurement is in "
                     "experiments.md / PERF.md"}))
        raise SystemExit(3)


def main():
    _probe_devices()
    import jax

    from boxsegliver_tpu.cli.main import build_trainer
    from boxsegliver_tpu.data import synthetic
    from boxsegliver_tpu.data.pipeline import TrainDataset
    from boxsegliver_tpu.data.sampler import TrainSampler

    ds_root = Path("/tmp/boxseg_bench_ds")
    if not (ds_root / "meta.json").exists():
        synthetic.make_synthetic_dataset(ds_root, n_cases=4,
                                         shape=(24, 512, 512), k_split=4,
                                         with_features=False)
    args = product_args("/tmp/boxseg_bench_model")
    args.num_replicas = 1  # single-chip measurement

    from boxsegliver_tpu.data.device_cache import DeviceVolumeCache
    from boxsegliver_tpu.data.kfold import (LITS_SEED, read_or_create_k_folds,
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
                           zbase=cache.zbase)
    dataset = TrainDataset(sampler, args, seed=args.seed, raw=True,
                           workers=1, prefetch=4)
    it = iter(dataset)
    drain_every = int(args.metrics_fetch_steps)

    # Compile the product step ONCE ahead of time and use the same executable
    # for cost analysis AND timing (the tunnel's remote compile costs minutes;
    # two separate compiles can blow the driver's bench budget on a cold
    # cache).  The AOT-compiled object is the exact executable the trainer's
    # jit would run (same function, shardings, donation).
    import numpy as np
    rng0 = jax.random.PRNGKey(0)
    if SPD > 1:
        raws = [next(it) for _ in range(SPD)]
        stacked0 = {k: np.stack([b[k] for b in raws]) for k in raws[0]}
        feats0 = jax.device_put(stacked0, trainer._stacked_sharding)
        compiled = trainer._multi_step.lower(trainer.state, feats0,
                                             rng0).compile()
        # XLA cost analysis reports the lax.scan BODY once, not x SPD
        # (measured: SPD=8 run showed exactly 1/8 the SPD=1 mfu when this
        # divided by SPD) — the scan executable's flops ARE per step
        flops_per_step = _step_flops(compiled)
    else:
        batch0 = next(it)
        feats0 = jax.device_put(batch0, trainer._data_sharding)
        compiled = trainer._train_step.lower(trainer.state, feats0, None,
                                             rng0).compile()
        flops_per_step = _step_flops(compiled)
    state = trainer.state

    def run_window(n, state):
        """n product steps: device_put raw batch -> fused compiled step ->
        bulk metric drain every drain_every steps (the product loop body).
        With SPD>1 the K-step scan executable dispatches n/K times."""
        pending, done = [], 0
        t0 = time.perf_counter()
        while done < n:
            if SPD > 1:
                raws = [next(it) for _ in range(SPD)]
                stacked = {k: np.stack([b[k] for b in raws])
                           for k in raws[0]}
                feats = jax.device_put(stacked, trainer._stacked_sharding)
                state, metrics = compiled(state, feats, rng0)
                done += SPD
            else:
                batch = next(it)
                feats = jax.device_put(batch, trainer._data_sharding)
                state, metrics = compiled(state, feats, None, rng0)
                done += 1
            pending.append(metrics)
            if len(pending) * SPD >= drain_every:
                jax.device_get(pending)
                pending = []
        if pending:
            jax.device_get(pending)
        return time.perf_counter() - t0, state

    _, state = run_window(3, state)  # warmup
    windows = []
    for _ in range(WINDOWS):
        dt, state = run_window(STEPS, state)
        windows.append(dt)
    windows = sorted(windows)
    med = statistics.median(windows)
    best = windows[0]
    med_sps = STEPS * BATCH_SIZE / med
    best_sps = STEPS * BATCH_SIZE / best
    dataset.close()
    mfu = med_sps * flops_per_step / BATCH_SIZE / (PEAK_BF16_TFLOPS * 1e12)
    print(json.dumps({
        "metric": METRIC,
        "value": round(med_sps, 1),
        "unit": "slices/sec/chip",
        "vs_baseline": round(med_sps / BASELINE_PER_CHIP, 3),
        "best": round(best_sps, 1),
        "mfu": round(mfu, 3),
        "ceiling_sps": CEILING_SPS,
        "pct_of_ceiling": round(med_sps / CEILING_SPS, 3),
        "windows_ms_per_step": [round(w / STEPS * 1e3, 1) for w in windows],
    }))


def _step_flops(compiled) -> float:
    """XLA cost analysis of the compiled product step (for the MFU report)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


if __name__ == "__main__":
    main()
