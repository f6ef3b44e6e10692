"""Measure 2D whole-case eval throughput: host slice_batches path vs the
device-resident fast path (evaluators/device_eval.py), on the real chip.

Workload: UNet-64 bf16 eval at 256², 4-way mirror TTA, over synthetic cases
(the bench.py dataset), reporting sec/case for both paths.

Usage: python tools/bench_eval2d.py [--cases 3] [--mirror]
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
    ap.add_argument("--cases", type=int, default=3)
    ap.add_argument("--no_mirror", action="store_true")
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from boxsegliver_tpu.data import synthetic
    from boxsegliver_tpu.data.meta import load_meta
    from boxsegliver_tpu.evaluators.device_eval import DeviceSlicePredictor
    from boxsegliver_tpu.evaluators.eval_loader import parse_case_eval
    from boxsegliver_tpu.evaluators.volume import EvaluateVolume
    from boxsegliver_tpu.models import build_model, load_model_config
    from boxsegliver_tpu.train.trainer import TrainState
    from flax.core import FrozenDict

    ds_root = Path("/tmp/boxseg_bench_ds")
    if not (ds_root / "meta.json").exists():
        synthetic.make_synthetic_dataset(ds_root, n_cases=4,
                                         shape=(24, 512, 512), k_split=4,
                                         with_features=False)
    args = bench.product_args("/tmp/boxseg_eval2d_model")
    args.eval_mirror = not opts.no_mirror

    model = build_model("UNet", args=args,
                        model_kwargs=load_model_config("UNet"),
                        num_classes=3, dtype=jnp.bfloat16)
    feats = {"images": np.zeros((args.batch_size, 256, 256, 3), np.float32)}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))

    ev = EvaluateVolume(args, ds_root, ["Liver", "Tumor"])
    predictor = DeviceSlicePredictor(model, state, args)
    host_fn = jax.jit(lambda f: jax.nn.softmax(
        model.apply(variables, f, train=False).astype(jnp.float32), -1))

    metas = load_meta(ds_root)[:opts.cases]
    cases = [parse_case_eval(m, ds_root, im_channel=3) for m in metas]

    # warm both compiles
    _ = ev.predict_case(host_fn, cases[0])
    _ = ev.predict_case(predictor, cases[0])

    for name, fn in (("host slice_batches", host_fn),
                     ("device-resident", predictor)):
        t0 = time.perf_counter()
        total_slices = 0
        for case in cases:
            probs = ev.predict_case(fn, case)
            total_slices += probs.shape[0]
            _ = float(np.asarray(probs).ravel()[0])
        dt = time.perf_counter() - t0
        print(f"{name:20s}: {dt / len(cases):6.2f} s/case "
              f"({total_slices / dt:6.1f} slices/s)", flush=True)


if __name__ == "__main__":
    main()
