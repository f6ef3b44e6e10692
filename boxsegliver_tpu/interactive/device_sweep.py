"""Device-resident interactive guided eval: both Forward/Backward
guide-propagation sweeps of one case as a single jitted dispatch.

The host state machine (interactive/propagation.GuidePropagationLoader,
mirroring reference DataLoader/Liver/input_pipeline_g.py:1179-1513) is
inherently sequential — each slice's spatial guide is rendered from the
PREVIOUS slice's filtered prediction — so the reference-style loop costs two
tunnel round trips per slice (~35 ms dispatch floor each on the remote TPU,
plus ~6 MB of traffic per slice for the mirror batch and float probs).

TPU-first recast: the whole sweep is a `lax.scan` whose carry is the
propagated object state (fixed K slots: center/stddev/z-range/valid) and
whose body runs guide render -> mirror-TTA forward -> CC labeling ->
FP filtering -> robust moments entirely in-graph (ops/labeling.py).  Both
sweep directions and their max-merge compile into ONE dispatch per case:
upload the resized volume once, fetch the merged probability volume once.

Semantics match the host loop object-for-object (tests/test_device_sweep.py
pins full-trajectory parity); two documented deviations, both tie-breaks:
- candidate guides at EXACTLY equal squared distance from an object's peak
  are tried in slot order (host: numpy unstable quicksort order);
- the Wu-line pixel chain is evaluated in closed-form float32 (see
  ops/labeling.wu_ascent).
Slices with more than `max_objects` predicted components set an overflow
flag; run_g falls back to the host loop for those cases.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

from boxsegliver_tpu.evaluators.eval_loader import EvalCase
from boxsegliver_tpu.interactive.propagation import GUIDE_BG, mirror_variants

_STD_BUCKETS = (4, 8, 16, 32)


def _bucket(n: int, buckets=_STD_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class GuidedSweepPredictor:
    """predict_fn for EvaluateVolume.run_g with a `.sweep_case` fast path.

    Callable on a plain feature dict (host fallback path), like
    DeviceSlicePredictor."""

    def __init__(self, model, state, args, num_classes: int, tumor_id: int,
                 mesh=None):
        import jax

        self.args = args
        self.model = model
        # Optional multi-chip spatial partitioning: the sweep is a sequential
        # scan (slice n's guide depends on slice n-1's prediction) so there is
        # no batch axis to shard — instead the per-step TTA forward is
        # sharded over the image HEIGHT axis (XLA SPMD partitions the convs
        # with halo exchanges over the mesh axis).  The mirror-TTA batch (4)
        # is smaller than typical meshes, so the spatial axis is the one that
        # scales.  mesh=None (default) = single-device, the reference's mode.
        self.mesh = mesh
        self.pshape = (int(args.im_height), int(args.im_width))
        self.min_std = float(getattr(args, "min_std", 2.0))
        self.eval_discount = float(getattr(args, "eval_discount", 0.85))
        self.num_classes = int(num_classes)
        self.tumor_id = int(tumor_id)
        self.max_objects = int(getattr(args, "sweep_max_objects", 16) or 16)
        self.flips = tuple(mirror_variants(
            int(getattr(args, "random_flip", 3)),
            bool(getattr(args, "eval_mirror", False))))
        variables = {"params": state.params}
        if getattr(state, "batch_stats", None):
            variables["batch_stats"] = state.batch_stats
        self._variables = variables
        self._plain = jax.jit(
            lambda v, feats: jax.nn.softmax(
                model.apply(v, feats, train=False).astype(jax.numpy.float32),
                axis=-1))
        # per-instance cache (NOT @lru_cache on the method, which keys on
        # self at class scope and would pin params + executables for process
        # lifetime across predictors, e.g. during eval_all_ckpt sweeps)
        self._compiled = functools.lru_cache(maxsize=None)(self._compiled)

    def __call__(self, feats):
        return self._plain(self._variables, feats)

    # ------------------------------------------------------------------
    # host-side per-case precompute
    # ------------------------------------------------------------------

    def _user_prior_arrays(self, case: EvalCase, prior_case: Dict,
                           d_pad: int, mu: int):
        """Per-cropped-slice padded user-prior arrays, applying the host
        loader's filter + coordinate transform (propagation.py:93-101)."""
        ph, pw = self.pshape
        z1 = case.crop[0]
        y1, x1 = case.crop[2], case.crop[4]
        ch, cw = case.volume.shape[1:]
        centers = np.zeros((d_pad, mu, 2), np.int32)
        stds = np.full((d_pad, mu, 2), -1.0, np.float32)
        zr = np.zeros((d_pad, mu, 2), np.int32)
        valid = np.zeros((d_pad, mu), bool)
        overflow = False
        for sid_str, objs in (prior_case or {}).items():
            idx = int(sid_str) - z1
            if not 0 <= idx < case.depth:
                continue
            k = 0
            for obj in objs:
                if np.min(obj["stddev"]) <= self.min_std:
                    continue
                if k >= mu:
                    overflow = True
                    break
                centers[idx, k] = [int((obj["center"][0] - y1) / ch * ph),
                                   int((obj["center"][1] - x1) / cw * pw)]
                stds[idx, k] = obj["stddev"]
                zr[idx, k] = obj["z"]
                valid[idx, k] = True
                k += 1
        return centers, stds, zr, valid, overflow

    # ------------------------------------------------------------------
    # the jitted double sweep
    # ------------------------------------------------------------------

    def _compiled(self, d_pad: int, channels: int, mu: int, with_ctx: bool,
                  ctx_len: int):
        import jax
        import jax.numpy as jnp

        from boxsegliver_tpu.ops.guides import gaussian_guide
        from boxsegliver_tpu.ops.labeling import (label_components,
                                                  object_moments,
                                                  ordered_seeds, wu_ascent)

        model = self.model
        ph, pw = self.pshape
        k_obj = self.max_objects
        nc = self.num_classes
        tumor_id = self.tumor_id
        min_std = self.min_std
        discount = self.eval_discount
        flips = self.flips
        thresh = 0.15 + GUIDE_BG
        sentinel = ph * pw

        mesh = self.mesh

        def forward_tta(variables, images, guide, ctx):
            """images [ph, pw, c]; guide [ph, pw] -> merged probs."""
            n = len(flips)
            ims, gds = [], []
            for axes in flips:
                im, gd = images, guide[..., None]
                for ax in axes:                       # NHWC axis - batch dim
                    im = jnp.flip(im, axis=ax - 1)
                    gd = jnp.flip(gd, axis=ax - 1)
                ims.append(im)
                gds.append(gd)
            feats = {"images": jnp.stack(ims), "sp_guide": jnp.stack(gds)}
            if with_ctx:
                feats["context"] = jnp.tile(ctx[None], (n, 1))
            if mesh is not None:
                # partition the TTA forward over the height axis (halo
                # exchanges ride the mesh's ICI; batch/width replicated)
                from jax.sharding import NamedSharding, PartitionSpec as P
                row = NamedSharding(mesh, P(None, "data", None, None))
                feats = {k: (jax.lax.with_sharding_constraint(v, row)
                             if v.ndim == 4 else v)
                         for k, v in feats.items()}
            logits = model.apply(variables, feats, train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            acc = jnp.zeros((ph, pw, nc), jnp.float32)
            for i, axes in enumerate(flips):
                p = probs[i]
                for ax in axes:
                    p = jnp.flip(p, axis=ax - 1)
                acc = acc + p
            return acc / n

        def step(carry, xs, variables, pvol, ctx_rows, user, fwd_sweep):
            p_valid, p_center, p_std, p_zr = carry
            idx, sid = xs

            u_center, u_std, u_zr, u_valid = (a[idx] for a in user)
            centers = jnp.concatenate(
                [u_center, p_center]).astype(jnp.float32)       # [M, 2]
            stds = jnp.maximum(jnp.concatenate([u_std, p_std]),
                               jnp.float32(min_std))
            zrs = jnp.concatenate([u_zr, p_zr])
            valid = jnp.concatenate([u_valid, p_valid])

            raw = gaussian_guide((ph, pw), centers, stds, mask=valid,
                                 keepdims=False)
            guide = raw * discount / 2.0 + GUIDE_BG

            window = jax.lax.dynamic_slice(
                pvol, (idx, 0, 0), (channels, ph, pw))
            images = jnp.transpose(window, (1, 2, 0))
            ctx = ctx_rows[idx] if with_ctx else None
            probs = forward_tta(variables, images, guide, ctx)

            pred = jnp.argmax(probs, axis=-1) == tumor_id

            labels = label_components(pred)
            seeds, n_objs = ordered_seeds(labels, k_obj)
            obj = (labels[None] == seeds[:, None, None]) \
                & (seeds[:, None, None] < sentinel)             # [K, h, w]
            obj_valid = seeds < sentinel

            masked = jnp.where(obj, guide[None], -1.0)
            support = masked.max(axis=(1, 2)) >= thresh
            flat_peak = jnp.argmax(masked.reshape(k_obj, -1), axis=1)
            peak = jnp.stack([flat_peak // pw, flat_peak % pw],
                             axis=-1).astype(jnp.int32)         # [K, 2]

            ic = centers.astype(jnp.int32)
            exact = valid[None] & (peak[:, :1] == ic[None, :, 0]) \
                & (peak[:, 1:] == ic[None, :, 1])               # [K, M]
            any_exact = jnp.any(exact, axis=1)
            j_exact = jnp.argmax(exact, axis=1)

            diff = peak[:, None].astype(jnp.float32) - centers[None]
            dist = jnp.where(valid[None], (diff ** 2).sum(-1), jnp.inf)
            order = jnp.argsort(dist, axis=1)                   # stable
            asc = jax.vmap(lambda p: wu_ascent(guide, p, ic))(peak)
            cand = jnp.take_along_axis(valid[None] & asc, order, axis=1)
            has_cand = jnp.any(cand, axis=1)
            j_near = jnp.take_along_axis(
                order, jnp.argmax(cand, axis=1)[:, None], axis=1)[:, 0]

            found = jnp.where(any_exact, j_exact, j_near)
            found_ok = any_exact | has_cand
            zr_f = zrs[found]                                   # [K, 2]
            zfail = jnp.where(fwd_sweep, sid >= zr_f[:, 1], sid <= zr_f[:, 0])
            survive = obj_valid & support & found_ok & ~zfail

            m_center, m_std = object_moments(obj, min_std=min_std)
            new_carry = (survive, m_center.astype(jnp.int32),
                         m_std, zr_f)
            return new_carry, (probs, n_objs)

        def sweep(variables, pvol, ctx_rows, user, order, sids, fwd_sweep):
            init = (jnp.zeros((k_obj,), bool),
                    jnp.zeros((k_obj, 2), jnp.int32),
                    jnp.full((k_obj, 2), -1.0, jnp.float32),
                    jnp.zeros((k_obj, 2), jnp.int32))
            body = functools.partial(step, variables=variables, pvol=pvol,
                                     ctx_rows=ctx_rows, user=user,
                                     fwd_sweep=fwd_sweep)
            _, (probs, n_objs) = jax.lax.scan(
                lambda c, x: body(c, x), init, (order, sids))
            return probs, n_objs

        def run(variables, pvol, ctx_rows, user, sid0, cz):
            fwd_order = jnp.arange(d_pad, dtype=jnp.int32)
            orders = jnp.stack([fwd_order, fwd_order[::-1]])
            # both directions are independent until the max-merge: run them
            # as ONE batched scan (vmap over the direction axis) — half the
            # scan steps, twice the model batch, amortized small-op overhead
            probs, n_objs = jax.vmap(
                lambda o, s, f: sweep(variables, pvol, ctx_rows, user,
                                      o, s, f))(orders, orders + sid0,
                                                jnp.array([True, False]))
            merged = jnp.maximum(probs[0], probs[1][::-1])
            # overflow only counts REAL slices: z-padding slices see a flat
            # GUIDE_BG guide, so every object there fails the support
            # threshold and cannot enter the propagation state
            n_objs = jnp.where(orders < cz, n_objs, 0)
            return merged, n_objs.max()

        return jax.jit(run)

    # ------------------------------------------------------------------

    def sweep_case(self, case: EvalCase, prior_case: Dict,
                   context: Optional[np.ndarray] = None
                   ) -> Tuple[Optional[np.ndarray], int]:
        """Merged Forward/Backward probability volume [cz, ph, pw, nc] for
        one case, or (None, n_objs) when an object/prior count overflowed
        the static caps (caller falls back to the host loop)."""
        import jax

        from boxsegliver_tpu.evaluators.device_eval import _resize_stack

        cz = case.depth
        channels = case.lhc + case.rhc + 1
        d_pad = _bucket(cz, (32, 64, 96, 128, 192, 256))
        mu_needed = max((sum(1 for o in objs
                             if np.min(o["stddev"]) > self.min_std)
                         for objs in (prior_case or {}).values()), default=0)
        mu = _bucket(max(mu_needed, 1))

        user = self._user_prior_arrays(case, prior_case, d_pad, mu)
        if user[-1]:
            return None, -1
        user = user[:-1]

        vol = _resize_stack(np.asarray(case.volume), self.pshape)
        z_extra = d_pad + channels - 1 - vol.shape[0]
        if z_extra > 0:
            vol = np.concatenate(
                [vol, np.zeros((z_extra,) + vol.shape[1:], np.float32)])

        ctx_rows = np.zeros((1, 1), np.float32)
        with_ctx = context is not None
        if with_ctx:
            z0 = case.crop[0]
            ctx_rows = np.zeros((d_pad, context.shape[1]), np.float32)
            valid_rows = max(0, min(cz, context.shape[0] - z0))
            if valid_rows:
                ctx_rows[:valid_rows] = context[z0:z0 + valid_rows]

        fn = self._compiled(d_pad, channels, mu, with_ctx,
                            ctx_rows.shape[1] if with_ctx else 0)
        merged, n_max = fn(self._variables, jax.device_put(vol),
                           jax.device_put(ctx_rows),
                           tuple(jax.device_put(u) for u in user),
                           np.int32(case.crop[0]), np.int32(cz))
        n_max = int(n_max)
        if n_max > self.max_objects:
            return None, n_max
        return np.asarray(merged[:cz], np.float32), n_max
