"""Micro-bench of the in-graph click-placement primitives at 2D-256² batch.

Round-5 refine_bench showed the batched device refine loop at 256² costs
17.8 s/case (~4 click rounds) while the same composition at 128² costs
0.13-0.26 s — this times each suspect of `largest_error_click` under
`vmap` over a [16, 256, 256] slice batch on the real chip to find which
primitive owns the blow-up:

  a. label_components (fixpoint min-propagation while_loop)
  b. the component-size histogram (scatter-add into size+1 bins)
  c. the erosion-to-core while_loop
  d. full largest_error_click
  e. a UNetInter-64 forward at [16,256,256,3] for scale

  python tools/bench_labeling.py [--sb 16] [--hw 256] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from boxsegliver_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()


def _blobby(sb, hw, seed=0):
    """Realistic refine-loop error masks: a few small rings/blobs per slice
    (boundary halo errors around 2-9 px lesions), not random speckle."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:hw, :hw]
    err = np.zeros((sb, hw, hw), bool)
    for s in range(sb):
        for _ in range(rng.randint(2, 6)):
            cy, cx = rng.randint(10, hw - 10, 2)
            r = rng.randint(2, 9)
            d2 = (yy - cy) ** 2 + (xx - cx) ** 2
            if rng.rand() < 0.5:
                err[s] |= d2 <= r * r                     # blob
            else:
                err[s] |= (d2 <= r * r) & (d2 >= (r - 2) ** 2)  # ring
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sb", type=int, default=16)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    opts = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from boxsegliver_tpu.ops.labeling import (label_components,
                                              largest_error_click)

    sb, hw = opts.sb, opts.hw
    err = jnp.asarray(_blobby(sb, hw))
    zeros = jnp.zeros_like(err)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        # tunnel block_until_ready can return early — close with device_get
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            out = f(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        ms = (time.perf_counter() - t0) / opts.iters * 1e3
        print(json.dumps({"metric": "labeling_bench", "op": name,
                          "sb": sb, "hw": hw, "ms": round(ms, 2)}),
              flush=True)
        return ms

    timeit("label_components_vmap",
           lambda e: jax.vmap(label_components)(e), err)

    def hist(e):
        labels = jax.vmap(label_components)(e)
        size = hw * hw
        return jax.vmap(lambda l: jnp.zeros(size + 1, jnp.int32)
                        .at[l.reshape(-1)].add(1, mode="drop"))(labels)
    timeit("labels_plus_histogram_vmap", hist, err)

    timeit("largest_error_click_vmap",
           lambda p, l: jax.vmap(largest_error_click)(p, l), zeros, err)

    # model forward for scale (UNetInter-64, the inter rung's net)
    from boxsegliver_tpu.models import build_model
    model = build_model("UNetInter", model_kwargs={}, num_classes=2,
                        dtype=jnp.bfloat16)
    feats = {"images": jnp.zeros((sb, hw, hw, 3), jnp.float32),
             "sp_guide": jnp.zeros((sb, hw, hw, 2), jnp.float32)}
    variables = model.init(jax.random.PRNGKey(0), feats, train=False)

    timeit("unetinter_forward",
           lambda v, f: model.apply(v, f, train=False), variables, feats)

    # guide render (max over T=10 click slots: the [sb,T,hw,hw] broadcast)
    pts = jnp.zeros((sb, 10, 2), jnp.int32)
    msk = jnp.ones((sb, 10), bool)
    iy = jnp.arange(hw, dtype=jnp.float32)[:, None]
    ix = jnp.arange(hw, dtype=jnp.float32)[None, :]

    def render(p, m):
        py = p[..., 0].astype(jnp.float32)[:, :, None, None]
        px = p[..., 1].astype(jnp.float32)[:, :, None, None]
        d2 = (iy[None, None] - py) ** 2 + (ix[None, None] - px) ** 2
        return jnp.where(m[:, :, None, None],
                         jnp.exp(-d2 / 50.0), 0.0).max(axis=1)
    timeit("guide_render_T10", render, pts, msk)

    # the full device refine loop, 1 and 5 click rounds (per-round cost =
    # the difference / 4); random weights click forever, so rounds = t_max
    from boxsegliver_tpu.interactive.device_refine import DeviceRefiner2D
    from boxsegliver_tpu.train.trainer import TrainState
    from flax.core import FrozenDict
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", FrozenDict()),
                       opt_state=(), lr_scale=jnp.ones((), jnp.float32))
    imgs = np.random.RandomState(1).rand(sb, hw, hw, 3).astype(np.float32)
    labs = np.asarray(_blobby(sb, hw, seed=2)).astype(np.int32)
    for t_max in (1, 5):
        ref = DeviceRefiner2D(model, state, dice_thresh=0.99,
                              max_iters=t_max, stddev=5.0, guide_channel=2)
        ref.refine_case(imgs, labs)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(max(1, opts.iters // 2)):
            out = ref.refine_case(imgs, labs)
        ms = (time.perf_counter() - t0) / max(1, opts.iters // 2) * 1e3
        print(json.dumps({"metric": "labeling_bench",
                          "op": f"refine_case_tmax{t_max}",
                          "sb": sb, "hw": hw, "ms": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
