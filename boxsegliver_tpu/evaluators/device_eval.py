"""Device-resident whole-case 2D evaluation.

The reference evaluates by feeding per-batch host arrays through a
placeholder graph (evaluator_liver.py:747-759) — per 64-slice case with
4-way mirror TTA that is ~250 MB of host↔device traffic (each mirror batch
re-uploads the same pixels).  TPU-first redesign: upload the case ONCE
(resized volume + optional per-slice guides/context), then ONE jitted call
per slice batch forms the 2.5D channel stacks, runs all mirror variants as
one forward, and averages the flipped-back probabilities in-graph — only the
mirror-averaged probs come back (~29 MB per case, ~8x less traffic).

Numerics match the host path (evaluators/eval_loader.slice_batches +
EvaluateVolume.predict_case) to float tolerance: the volume is resized with
the same host cv2 call (reference input_pipeline_g.py:952 resizes the volume
once per case), stacking/flipping/averaging is a reassociation of the same
math.  Pinned by tests/test_device_eval.py.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from boxsegliver_tpu.evaluators.eval_loader import EvalCase

_FLIP_AXES = {1: 2, 2: 1}  # mirror id -> image axis (W, H); 3 = both


def _resize_stack(arr: np.ndarray, pshape) -> np.ndarray:
    """[Z, h, w] -> [Z, ph, pw] bilinear (cv2, reference semantics)."""
    import cv2

    if arr.shape[1:] == tuple(pshape):
        return np.ascontiguousarray(arr, np.float32)
    out = np.empty((arr.shape[0],) + tuple(pshape), np.float32)
    for z in range(arr.shape[0]):
        out[z] = cv2.resize(arr[z].astype(np.float32),
                            (pshape[1], pshape[0]),
                            interpolation=cv2.INTER_LINEAR)
    return out


class DeviceSlicePredictor:
    """Drop-in for the predict_fn handed to EvaluateVolume: exposes
    `.device_case(case, context, sp_guide, guide_bg)` which EvaluateVolume
    prefers over the host slice_batches path.  Also callable on a feature
    dict (falling back to a plain jitted forward) so run_g keeps working."""

    def __init__(self, model, state, args, mesh=None):
        """mesh: optional 1-D data mesh — shards the slice-batch axis of
        every eval dispatch across devices (multi-chip 2D eval, a capability
        the single-GPU-eval reference lacks, reference README.md:156).
        args.batch_size stays the GLOBAL batch (the reference per-replica
        contract, utils/distribution_utils.py:107-134)."""
        import jax

        self.args = args
        self.pshape = (args.im_height, args.im_width)
        self.bs = int(args.batch_size)
        self.mesh = mesh if mesh is not None and mesh.size > 1 else None
        if self.mesh is not None:
            from boxsegliver_tpu.parallel.mesh import (DATA_AXIS,
                                                       per_device_batch_size)
            per_device_batch_size(self.bs, self.mesh.size)  # divisibility
            from jax.sharding import NamedSharding, PartitionSpec
            self._repl = NamedSharding(self.mesh, PartitionSpec())
            self._batch_sharded = NamedSharding(self.mesh,
                                                PartitionSpec(DATA_AXIS))
        rf = int(getattr(args, "random_flip", 3))
        self.mirrors = [0]
        if getattr(args, "eval_mirror", False):
            if rf & 1:
                self.mirrors.append(1)
            if rf & 2:
                self.mirrors.append(2)
            if rf & 3 == 3:
                self.mirrors.append(3)
        variables = {"params": state.params}
        if getattr(state, "batch_stats", None):
            variables["batch_stats"] = state.batch_stats
        if self.mesh is not None:
            variables = jax.device_put(variables, self._repl)
        self._variables = variables
        self._model = model
        jit_kw = {}
        if self.mesh is not None:
            # replicate the case upload, shard the probability output on the
            # batch axis; XLA SPMD partitions the gather + forward to match
            jit_kw["out_shardings"] = self._batch_sharded
        self._fwd = jax.jit(self._make_fwd(), static_argnames=("c", "with_g",
                                                               "with_ctx"),
                            **jit_kw)
        self._plain = jax.jit(
            lambda v, feats: jax.nn.softmax(
                model.apply(v, feats, train=False), axis=-1))

    # plain predict_fn behavior (run_g per-slice path, online eval, ...)
    def __call__(self, feats):
        return self._plain(self._variables, feats)

    def _make_fwd(self):
        import jax
        import jax.numpy as jnp

        model = self._model
        mirrors = tuple(self.mirrors)
        bs = self.bs

        def fwd(variables, vol, guide, ctx, z0, *, c, with_g, with_ctx):
            """vol: [Z, ph, pw] (Z = cz + c - 1 halo); guide: [cz, ph, pw];
            ctx: [cz, L]; z0: first cropped-slice index of the batch.
            Returns mirror-averaged probs [bs, ph, pw, nc]."""
            zmax = vol.shape[0] - c
            zs = jnp.clip(z0 + jnp.arange(bs), 0, zmax)
            idx = zs[:, None] + jnp.arange(c)[None, :]        # [bs, c]
            images = jnp.transpose(vol[idx], (0, 2, 3, 1))    # [bs, ph, pw, c]
            feats = {"images": images}
            if with_g:
                g = guide[jnp.clip(z0 + jnp.arange(bs), 0,
                                   guide.shape[0] - 1)][..., None]
                feats["sp_guide"] = g
            if with_ctx:
                feats["context"] = ctx[jnp.clip(z0 + jnp.arange(bs), 0,
                                                ctx.shape[0] - 1)]
            # all mirror variants as ONE forward (batch-stacked)
            var_feats = {k: [] for k in feats}
            for m in mirrors:
                for k, v in feats.items():
                    if k in ("images", "sp_guide"):
                        t = v
                        if m & 1:
                            t = jnp.flip(t, axis=2)
                        if m & 2:
                            t = jnp.flip(t, axis=1)
                        var_feats[k].append(t)
                    else:
                        var_feats[k].append(v)
            big = {k: jnp.concatenate(v, axis=0) for k, v in var_feats.items()}
            logits = model.apply(variables, big, train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            acc = 0.0
            for i, m in enumerate(mirrors):
                p = probs[i * bs:(i + 1) * bs]
                if m & 1:
                    p = jnp.flip(p, axis=2)
                if m & 2:
                    p = jnp.flip(p, axis=1)
                acc = acc + p / len(mirrors)
            return acc

        return fwd

    @staticmethod
    def _pad_z(arr: np.ndarray, bucket: int = 64) -> np.ndarray:
        """Pad the z axis up to a bucket multiple so case depth does not
        retrace the jit (each retrace costs minutes on the remote TPU)."""
        pad = (-arr.shape[0]) % bucket
        if pad:
            arr = np.concatenate(
                [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)
        return arr

    def device_case(self, case: EvalCase,
                    context: Optional[np.ndarray] = None,
                    sp_guide: Optional[np.ndarray] = None) -> np.ndarray:
        """Mirror-averaged softmax volume [cz, ph, pw, nc] for one case —
        the device-resident equivalent of EvaluateVolume.predict_case."""
        import jax

        c = case.lhc + case.rhc + 1
        cz = case.depth
        put = (lambda x: jax.device_put(x, self._repl)) \
            if self.mesh is not None else jax.device_put
        vol = put(self._pad_z(
            _resize_stack(np.asarray(case.volume), self.pshape)))
        guide = ctx = None
        if sp_guide is not None:
            g = np.asarray(sp_guide, np.float32)
            if g.shape[1:] != tuple(self.pshape):
                g = _resize_stack(g, self.pshape)
            guide = put(self._pad_z(g))
        if context is not None:
            # per-cropped-slice rows, like slice_batches' absolute-z mapping
            z0 = case.crop[0]
            rows = np.zeros((cz, context.shape[1]), np.float32)
            valid = max(0, min(cz, context.shape[0] - z0))
            if valid:
                rows[:valid] = context[z0:z0 + valid]
            ctx = put(self._pad_z(rows))
        dummy_g = guide if guide is not None else np.zeros((1, 1, 1),
                                                           np.float32)
        dummy_c = ctx if ctx is not None else np.zeros((1, 1), np.float32)
        chunks = []
        for b0 in range(0, cz, self.bs):
            probs = self._fwd(self._variables, vol, dummy_g, dummy_c,
                              b0, c=c, with_g=guide is not None,
                              with_ctx=ctx is not None)
            chunks.append(np.asarray(probs, np.float32))
        out = np.concatenate(chunks, axis=0)[:cz]
        return out
