"""3D whole-volume evaluation: padded single-shot or sliding-window inference,
optionally sharded over the depth axis across the device mesh.

Reference behavior re-implemented:
- whole-volume 3D eval with --im_depth -1 (reference threed_script/
  201_unet_v*.sh + evaluator patch eval, evaluator_liver.py:524-586 overlap
  averaging).
- NEW TPU capability (SURVEY.md §5.7): the volume's z axis can be sharded
  over the mesh (jax sharding on the depth dim); XLA's SPMD partitioner
  inserts the conv halo exchanges over ICI, giving sequence-parallel
  inference the single-GPU reference could not do.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Tuple

import numpy as np

from boxsegliver_tpu.evaluators.base import EvaluateBase
from boxsegliver_tpu.ops.image_ops import zscore as _zscore_jnp
from boxsegliver_tpu.ops.metrics import ConfusionMatrix
from boxsegliver_tpu.ops.metrics3d import metric_3d

logger = logging.getLogger("boxsegliver")


def pad_to_multiple(vol: np.ndarray, mult: Tuple[int, int, int]):
    """Zero-pad [d, h, w] so each dim divides mult; returns (padded, pads)."""
    pads = [(-s) % m for s, m in zip(vol.shape[:3], mult)]
    if any(pads):
        vol = np.pad(vol, [(0, p) for p in pads] + [(0, 0)] * (vol.ndim - 3))
    return vol, pads


def make_volume_predict(model, state, mesh=None, z_axis_shards: int = 0,
                        ret: str = "prob", in_zscore: bool = False,
                        blank_guide_channels: int = 0):
    """Jitted whole-volume forward [1, d, h, w, c] → probs or pred.

    With z_axis_shards > 1, the depth axis is sharded over the mesh's data
    axis — XLA partitions the 3D convs spatially with halo exchanges.

    TPU-tunnel-aware fast path (PERF.md round 3: the device runs this model
    in ~85 ms/volume; fetching 67 MB of f32 probs through the tunnel
    dominated the 3D eval number):
    - ret='pred': device-side argmax, uint8 fetch (16x smaller; identical to
      host argmax of the probs).
    - in_zscore=True: the whole-volume nonzero z-score runs INSIDE the jit —
      callers upload the raw (uint16) volume once instead of a
      host→device→host→device float round trip.  Exposed to predict_case via
      the fn's `.in_zscore` attribute.
    - blank_guide_channels=N: models trained with --use_spatial get their
      click-free zero guide synthesized on device instead of uploading it.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fwd(variables, feats):
        feats = dict(feats)
        x = feats["images"].astype(jnp.float32)
        if in_zscore:
            x = _zscore_jnp(x)
        feats["images"] = x
        if blank_guide_channels and "sp_guide" not in feats:
            feats["sp_guide"] = jnp.zeros(
                x.shape[:-1] + (blank_guide_channels,), jnp.float32)
        logits = model.apply(variables, feats, train=False)
        if ret == "pred":
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return jax.nn.softmax(logits, axis=-1)

    variables = {"params": state.params}
    if getattr(state, "batch_stats", None):
        variables["batch_stats"] = state.batch_stats

    if mesh is not None and z_axis_shards and z_axis_shards > 1:
        rep = NamedSharding(mesh, P())
        zshard = NamedSharding(mesh, P(None, "data"))
        fwd_jit = jax.jit(fwd, in_shardings=(rep, zshard),
                          out_shardings=zshard)

        def predict(feats):
            feats = {k: jax.device_put(np.asarray(v), zshard)
                     for k, v in feats.items()}
            return fwd_jit(jax.device_put(variables, rep), feats)
    else:
        fwd_jit = jax.jit(fwd)

        def predict(feats):
            return fwd_jit(variables,
                           {k: np.asarray(v) for k, v in feats.items()})

    predict.ret = ret
    predict.in_zscore = in_zscore
    return predict


def _tile_starts(size: int, patch: int, step: int) -> List[int]:
    return sorted(set(list(range(0, size - patch + 1, step)) + [size - patch]))


def make_sliding_predict(model, state, patch: Tuple[int, int, int],
                         num_classes: int, overlap: float = 0.5,
                         ret: str = "pred", in_zscore: bool = False,
                         blank_guide_channels: int = 0):
    """Device-resident sliding-window inference: upload the padded volume
    once, `lax.scan` over tile starts with in-graph overlap-count averaging,
    fetch a uint8 argmax (ret='pred') or the averaged probs (ret='prob').

    Same math as `sliding_window_3d` (reference patch eval,
    evaluator_liver.py:524-586) — tile order, f32 accumulation order, and
    count division are identical, so outputs match the host loop
    (tests/test_pipeline3d.py) — but the per-tile tunnel round trips
    (upload + f32 prob fetch per tile, the dominant cost in PERF.md's
    13.3 volumes/min row) collapse into one dispatch per volume.

    The returned fn takes the PADDED [d, h, w, c] volume (raw when
    in_zscore, host-normalized otherwise — cascade channels allowed) and is
    marked `.sliding = True` for EvaluateVolume3D.predict_case routing.
    """
    import functools

    import jax
    import jax.numpy as jnp

    variables = {"params": state.params}
    if getattr(state, "batch_stats", None):
        variables["batch_stats"] = state.batch_stats

    @functools.lru_cache(maxsize=None)
    def compiled(pd: int, ph: int, pw: int):
        def run(variables, vol, starts):
            if in_zscore:
                vol = _zscore_jnp(vol.astype(jnp.float32))
            nch = vol.shape[-1]

            def body(carry, s):
                probs, counts = carry
                tile = jax.lax.dynamic_slice(
                    vol, (s[0], s[1], s[2], 0), (pd, ph, pw, nch))
                feats = {"images": tile[None].astype(jnp.float32)}
                if blank_guide_channels:
                    feats["sp_guide"] = jnp.zeros(
                        (1, pd, ph, pw, blank_guide_channels), jnp.float32)
                logits = model.apply(variables, feats, train=False)[0]
                p = jax.nn.softmax(logits, axis=-1)
                at = (s[0], s[1], s[2], 0)
                cur = jax.lax.dynamic_slice(probs, at, (pd, ph, pw, num_classes))
                probs = jax.lax.dynamic_update_slice(probs, cur + p, at)
                curc = jax.lax.dynamic_slice(counts, at, (pd, ph, pw, 1))
                counts = jax.lax.dynamic_update_slice(counts, curc + 1.0, at)
                return (probs, counts), None

            init = (jnp.zeros(vol.shape[:3] + (num_classes,), jnp.float32),
                    jnp.zeros(vol.shape[:3] + (1,), jnp.float32))
            (probs, counts), _ = jax.lax.scan(body, init, starts)
            avg = probs / counts
            if ret == "pred":
                return jnp.argmax(avg, axis=-1).astype(jnp.uint8)
            return avg

        return jax.jit(run)

    def predict(vol: np.ndarray) -> np.ndarray:
        vol = np.asarray(vol)
        d, h, w = vol.shape[:3]
        pd, ph, pw = (min(p, s) for p, s in zip(patch, (d, h, w)))
        steps = [max(1, int(p * (1 - overlap))) for p in (pd, ph, pw)]
        starts = np.asarray([(z0, y0, x0)
                             for z0 in _tile_starts(d, pd, steps[0])
                             for y0 in _tile_starts(h, ph, steps[1])
                             for x0 in _tile_starts(w, pw, steps[2])],
                            np.int32)
        return np.asarray(compiled(pd, ph, pw)(variables, vol, starts))

    predict.ret = ret
    predict.in_zscore = in_zscore
    predict.sliding = True
    return predict


def sliding_window_3d(predict_fn: Callable, volume: np.ndarray,
                      patch: Tuple[int, int, int], num_classes: int,
                      overlap: float = 0.5) -> np.ndarray:
    """Overlap-averaged sliding-window inference (reference patch eval,
    evaluator_liver.py:524-586).  volume: [d, h, w, c] normalized."""
    d, h, w = volume.shape[:3]
    pd, ph, pw = (min(p, s) for p, s in zip(patch, (d, h, w)))
    steps = [max(1, int(p * (1 - overlap))) for p in (pd, ph, pw)]
    probs = np.zeros((d, h, w, num_classes), np.float32)
    counts = np.zeros((d, h, w, 1), np.float32)
    starts = [sorted(set(list(range(0, s - p + 1, st)) + [s - p]))
              for s, p, st in zip((d, h, w), (pd, ph, pw), steps)]
    for z0 in starts[0]:
        for y0 in starts[1]:
            for x0 in starts[2]:
                tile = volume[z0:z0 + pd, y0:y0 + ph, x0:x0 + pw]
                p = np.asarray(predict_fn({"images": tile[None]}))[0]
                probs[z0:z0 + pd, y0:y0 + ph, x0:x0 + pw] += p
                counts[z0:z0 + pd, y0:y0 + ph, x0:x0 + pw] += 1.0
    return probs / counts


class EvaluateVolume3D(EvaluateBase):
    """Whole-volume 3D evaluator (UNet3D path)."""

    def __init__(self, args, dataset_dir, classes: List[str],
                 align: Tuple[int, int, int] = (2, 16, 16)):
        super().__init__(classes, list(args.metrics_eval),
                         getattr(args, "primary_metric", None),
                         getattr(args, "secondary_metric", None))
        self.args = args
        self.dataset_dir = Path(dataset_dir)
        self.align = align

    def predict_case(self, predict_fn: Callable, volume: np.ndarray,
                     cascade=None) -> np.ndarray:
        """z-score + pad + (whole or sliding-window) forward → probs
        [d, h, w, nc] f32, or pred [d, h, w] uint8 when predict_fn was built
        with ret='pred' (make_volume_predict fast path).

        cascade: optional interactive.cascade.Cascade2D — its frozen-2D
        prediction channel is appended to the network input (reference
        main_eval_3d.py:348-369 / input_pipeline_3d.py:474-539)."""
        args = self.args
        fn_zscores = bool(getattr(predict_fn, "in_zscore", False))
        needs_extra = cascade is not None or getattr(args, "use_cascade",
                                                     False)
        assert not (fn_zscores and needs_extra), \
            "cascade channels need the host-normalized volume; build the " \
            "predict fn with in_zscore=False"
        if fn_zscores and not needs_extra:
            vol = volume[..., None]  # raw (uint16) upload; z-score in-graph
        else:
            vol = np.asarray(_zscore_jnp(volume.astype(np.float32)))[..., None]
        if cascade is not None:
            extra = cascade.extra_channel(vol[..., 0])
            vol = np.concatenate([vol, extra[..., None]], axis=-1)
        elif getattr(args, "use_cascade", False):
            # cascade-trained model, no frozen-2D producer at eval: feed the
            # neutral zero channel (= the train-time value for samples
            # without clicks, interactive/cascade.gt_cascade_channel)
            vol = np.concatenate([vol, np.zeros_like(vol)], axis=-1)
        padded, pads = pad_to_multiple(vol, self.align)
        if getattr(predict_fn, "sliding", False):
            # device-resident sliding window (make_sliding_predict): one
            # upload, in-graph tile scan + overlap averaging
            out = predict_fn(padded)
        elif args.im_depth > 0 and padded.shape[0] > args.im_depth:
            assert getattr(predict_fn, "ret", "prob") == "prob", \
                "sliding-window eval needs a prob-mode predict fn"
            out = sliding_window_3d(
                predict_fn, padded,
                (args.im_depth, args.im_height, args.im_width),
                num_classes=len(self.classes) + 1)
        else:
            out = np.asarray(predict_fn({"images": padded[None]}))[0]
        if any(pads):
            out = out[:out.shape[0] - pads[0],
                      :out.shape[1] - pads[1],
                      :out.shape[2] - pads[2]]
        return out

    def run(self, predict_fn: Callable, case_metas: Iterable[Dict],
            do_eval: bool = True, cascade=None) -> Dict[str, float]:
        args = self.args
        self.clear_metrics()
        accumulator: Dict[str, int] = defaultdict(int)
        n = 0
        limit = getattr(args, "eval_num", -1)
        for meta in list(case_metas)[getattr(args, "eval_skip_num", 0):]:
            if 0 < limit <= n:
                break
            t0 = time.time()
            pid = int(meta["PID"])
            vol = np.load(self.dataset_dir / f"volume-{pid}" / "volume.npy")
            lab = np.load(self.dataset_dir / f"volume-{pid}" / "segmentation.npy")
            out = self.predict_case(predict_fn, vol, cascade=cascade)
            pred = (out if out.dtype == np.uint8
                    else out.argmax(-1).astype(np.uint8))
            results = {}
            if do_eval:
                for i, cls in enumerate(self.classes):
                    p = pred == i + 1
                    r = lab == i + 1
                    conf = ConfusionMatrix(p.astype(int), r.astype(int))
                    accumulator[cls + "_tp"] += conf.tp
                    accumulator[cls + "_fp"] += conf.fp
                    accumulator[cls + "_fn"] += conf.fn
                    pairs = metric_3d(p, r, required=self.metrics_str,
                                      sampling=meta["spacing"])
                    for met, v in pairs.items():
                        results[f"{cls}/{met}"] = v
                self.append_metrics(results)
            n += 1
            msg = " ".join(f"{k}: {v:.3f}" for k, v in results.items())
            logger.info("Evaluate3D-%d case %s %s (%.3f s)", n, pid, msg,
                        time.time() - t0)
        results = self.mean_metrics()
        for cls in self.classes:
            denom = (2 * accumulator[cls + "_tp"] + accumulator[cls + "_fn"]
                     + accumulator[cls + "_fp"])
            if denom:
                results["G" + cls + "Dice"] = 2 * accumulator[cls + "_tp"] / denom
        return results
