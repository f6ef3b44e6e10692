"""Device-resident interactive click refinement: the whole per-case 2D
refinement loop (reference entry/main_eval.py:43-396, host re-implementation
`interactive/refine.interactive_eval_2d`) as ONE jitted dispatch.

The host loop costs one tunnel round trip per CLICK per SLICE (~35 ms
dispatch floor each), and refines slices one at a time.  TPU-first recast:
all lesion slices of a case refine SIMULTANEOUSLY — a `lax.while_loop` over
click rounds whose body places every slice's next click (in-graph largest
error component, `ops/labeling.largest_error_click`), renders the
gaussian/euclidean guides, and runs ONE batched model forward for the whole
case.  Slices that clear the Dice threshold (or run out of error) freeze via
masked updates, and the loop exits when every slice is done — so the batch
dimension does real work and the MXU sees batch = slices instead of 1.

Parity with the host loop is exact (tests/test_device_refine.py): the click
simulator is deterministic, and masked batched iteration visits the same
(slice, click) trajectory as the host's per-slice loop.  Geodesic guides run
in-graph too (ops/geodesic.py — the raster scan as a row-scan of min-plus
associative scans), carried as half-res distance fields that min-fold each
new click.
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np

_S_BUCKETS = (8, 16, 32, 64, 128, 256)


class DeviceRefiner2D:
    """One-dispatch-per-case interactive 2D refinement.

    Drop-in for the `interactive_eval_2d` call in cli/interactive_eval:
    `refine_case(images [S,h,w,c], labels [S,h,w])` returns the same
    {"Dice", "clicks", "slices"} dict.
    """

    def __init__(self, model, state, *, dice_thresh: float = 0.85,
                 max_iters: int = 10, stddev: float = 5.0,
                 guide_kind: str = "gaussian", guide_channel: int = 2,
                 mesh=None):
        if guide_kind not in ("gaussian", "euclidean", "geodesic"):
            raise ValueError(f"unknown guide kind {guide_kind!r}")
        self.model = model
        self.dice_thresh = float(dice_thresh)
        self.max_iters = int(max_iters)
        self.stddev = float(stddev)
        self.guide_kind = guide_kind
        self.guide_channel = int(guide_channel)
        # Optional multi-chip refinement: all lesion slices of a case refine
        # simultaneously (the batch axis is SLICES), so a data mesh shards
        # that axis — every click round runs batch-parallel across chips,
        # params replicated.  The slice buckets (_S_BUCKETS, min 8) are
        # powers of two, so they divide any power-of-two mesh.
        self.mesh = mesh
        variables = {"params": state.params}
        if getattr(state, "batch_stats", None):
            variables["batch_stats"] = state.batch_stats
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        self._variables = variables
        # per-instance cache (NOT @lru_cache on the method, which keys on
        # self at class scope and would pin params + compiled executables
        # for process lifetime across many predictors, e.g. eval_all_ckpt)
        self._compiled = functools.lru_cache(maxsize=None)(self._compiled)

    def _compiled(self, sb: int, h: int, w: int, c: int):
        import jax
        import jax.numpy as jnp

        from boxsegliver_tpu.ops.labeling import largest_error_click

        model = self.model
        t_max = self.max_iters
        thresh = self.dice_thresh
        sigma = self.stddev
        kind = self.guide_kind
        gc = self.guide_channel
        iy = jnp.arange(h, dtype=jnp.float32)[:, None]
        ix = jnp.arange(w, dtype=jnp.float32)[None, :]
        h2, w2 = (h + 1) // 2, (w + 1) // 2  # geodesic half-res grid

        def render(pts, mask):
            """Max-over-clicks guide maps: pts [S,T,2] i32, mask [S,T] ->
            [S,h,w] f32 (zeros where no valid clicks — the host render's
            empty-click convention)."""
            py = pts[..., 0].astype(jnp.float32)[:, :, None, None]
            px = pts[..., 1].astype(jnp.float32)[:, :, None, None]
            d2 = (iy[None, None] - py) ** 2 + (ix[None, None] - px) ** 2
            m = mask[:, :, None, None]
            if kind == "gaussian":
                g = jnp.where(m, jnp.exp(-d2 / (2.0 * sigma ** 2)), 0.0)
                return g.max(axis=1)
            dist = jnp.sqrt(jnp.where(m, d2, jnp.inf).min(axis=1))
            out = jnp.exp(-dist / max(sigma, 1e-6))
            return jnp.where(mask.any(axis=1)[:, None, None], out, 0.0)

        def geo_update(ds_imgs, coords, upd, dist):
            """Min-fold this round's click into the carried half-res
            distance field.  Exact: the raster relaxation is min-plus
            linear, so dist(seeds ∪ {p}) == min(dist(seeds), dist({p}))."""
            from boxsegliver_tpu.ops.geodesic import geodesic2d
            sy = jnp.clip(coords[:, 0] // 2, 0, h2 - 1)
            sx = jnp.clip(coords[:, 1] // 2, 0, w2 - 1)
            seeds = ((jnp.arange(h2)[None, :, None] == sy[:, None, None])
                     & (jnp.arange(w2)[None, None, :] == sx[:, None, None]))
            dnew = jax.vmap(lambda i, s: geodesic2d(i, s, 1.0, 4))(
                ds_imgs, seeds)
            return jnp.where(upd[:, None, None],
                             jnp.minimum(dist, dnew), dist)

        def geo_render(dist, mask_any):
            """Raw-distance guide, training convention
            (sampler_inter._geodesic_maps): half-res field bilinearly
            upsampled; slices with no clicks yet render zeros (also masks
            the inf/nan field those slices carry)."""
            full = jax.image.resize(dist, (sb, h, w), "linear")
            return jnp.where(mask_any[:, None, None], full, 0.0)

        def run(variables, images, labels):
            if kind == "geodesic":
                ds_imgs = images[:, ::2, ::2, c // 2]
                gh, gw = h2, w2
            else:
                gh = gw = 1  # distance fields unused; keep the carry tiny
            init = (jnp.zeros((sb, h, w), bool),          # pred
                    jnp.zeros((sb, t_max, 2), jnp.int32),  # pts
                    jnp.zeros((sb, t_max), bool),          # is_fg
                    jnp.zeros((sb, t_max), bool),          # valid
                    jnp.zeros((sb,), bool),                # done
                    jnp.zeros((sb,), jnp.float32),         # dice
                    jnp.zeros((sb,), jnp.int32),           # clicks
                    jnp.full((sb, gh, gw), jnp.inf),       # fg geo dist
                    jnp.full((sb, gh, gw), jnp.inf),       # bg geo dist
                    jnp.int32(0))                          # t

            def cond(s):
                return (s[-1] < t_max) & jnp.any(~s[4])

            def body(s):
                (pred, pts, isfg, valid, done, dice, clicks,
                 fg_d, bg_d, t) = s
                coords, fg, has_err = jax.vmap(largest_error_click)(
                    pred, labels)
                clicking = ~done & has_err
                pts = jax.lax.dynamic_update_slice(
                    pts, coords[:, None], (0, t, 0))
                isfg = jax.lax.dynamic_update_slice(
                    isfg, fg[:, None], (0, t))
                valid = jax.lax.dynamic_update_slice(
                    valid, clicking[:, None], (0, t))
                clicks = clicks + clicking
                if kind == "geodesic":
                    fg_d = geo_update(ds_imgs, coords, clicking & fg, fg_d)
                    bg_d = geo_update(ds_imgs, coords, clicking & ~fg, bg_d)
                    fg_g = geo_render(fg_d, (valid & isfg).any(axis=1))
                    bg_g = geo_render(bg_d, (valid & ~isfg).any(axis=1))
                else:
                    fg_g = render(pts, valid & isfg)
                    bg_g = render(pts, valid & ~isfg)
                if gc == 2:
                    guide = jnp.stack([fg_g, bg_g], axis=-1)
                else:
                    guide = (fg_g - bg_g)[..., None]
                logits = model.apply(variables,
                                     {"images": images, "sp_guide": guide},
                                     train=False)
                new_pred = jnp.argmax(logits, axis=-1) > 0
                tp = jnp.sum(new_pred & labels, axis=(1, 2))
                fp = jnp.sum(new_pred & ~labels, axis=(1, 2))
                fn = jnp.sum(~new_pred & labels, axis=(1, 2))
                denom = (2 * tp + fp + fn).astype(jnp.float32)
                new_dice = jnp.where(denom > 0,
                                     2.0 * tp.astype(jnp.float32) / denom,
                                     0.0)
                upd = clicking
                pred = jnp.where(upd[:, None, None], new_pred, pred)
                dice = jnp.where(upd, new_dice, dice)
                done = done | ~has_err | (upd & (new_dice > thresh))
                return (pred, pts, isfg, valid, done, dice, clicks,
                        fg_d, bg_d, t + 1)

            out = jax.lax.while_loop(cond, body, init)
            return out[5], out[6]                          # dice, clicks

        return jax.jit(run)

    def refine_case(self, images: np.ndarray, labels: np.ndarray
                    ) -> Dict[str, float]:
        """images [S,h,w,c] f32, labels [S,h,w] (nonzero = lesion)."""
        import jax

        lab = np.asarray(labels) > 0
        lesion = lab.any(axis=(1, 2))
        if not lesion.any():
            return {"Dice": 1.0, "clicks": 0.0, "slices": 0.0}
        images = np.asarray(images, np.float32)[lesion]
        lab = lab[lesion]
        s, h, w = lab.shape
        sb = next((b for b in _S_BUCKETS if s <= b), s)
        if self.mesh is not None and sb % self.mesh.size:
            sb += self.mesh.size - sb % self.mesh.size  # beyond-bucket cases
        if sb > s:
            images = np.concatenate(
                [images, np.zeros((sb - s,) + images.shape[1:], np.float32)])
            lab = np.concatenate([lab, np.zeros((sb - s, h, w), bool)])
        fn = self._compiled(sb, h, w, images.shape[-1])
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            shard = NamedSharding(self.mesh, P("data"))
            dice, clicks = fn(self._variables,
                              jax.device_put(images, shard),
                              jax.device_put(lab, shard))
        else:
            dice, clicks = fn(self._variables, jax.device_put(images),
                              jax.device_put(lab))
        dice = np.asarray(dice)[:s]
        clicks = np.asarray(clicks)[:s]
        return {"Dice": float(dice.mean()), "clicks": float(clicks.mean()),
                "slices": float(s)}


class DeviceRefiner3D:
    """One-dispatch-per-case whole-VOLUME interactive refinement.

    Device recast of `interactive/refine.interactive_eval_3d` (reference
    entry/main_eval_3d.py:326-420): the host loop pays one tunnel round trip
    per click — a full [d,h,w] guide upload plus f32 prob fetch every
    iteration, with host scipy CC labeling in between.  Here the whole click
    loop (largest-3D-error-component click placement, incremental gaussian
    guide max-update, model forward with optional 8-way mirror TTA, Dice
    stop) runs as one `lax.while_loop` on device; only the final scalars
    come back.

    Parity with the host loop is exact for the gaussian guide without the
    cascade channel (tests/test_device_refine.py); cascade (a GT-oracle
    channel built host-side from the first positive click) stays on the host
    path.
    """

    def __init__(self, model, state, *, dice_thresh: float = 0.85,
                 max_iters: int = 20, stddev: float = 5.0,
                 tta: bool = False, guide_channel: int = 1):
        self.model = model
        self.dice_thresh = float(dice_thresh)
        self.max_iters = int(max_iters)
        self.stddev = float(stddev)
        self.tta = bool(tta)
        self.guide_channel = int(guide_channel)
        variables = {"params": state.params}
        if getattr(state, "batch_stats", None):
            variables["batch_stats"] = state.batch_stats
        self._variables = variables
        # per-instance cache — see DeviceRefiner2D.__init__ for why not
        # @lru_cache on the method
        self._compiled = functools.lru_cache(maxsize=None)(self._compiled)

    def _compiled(self, d: int, h: int, w: int, c: int,
                  vd: int, vh: int, vw: int):
        import jax
        import jax.numpy as jnp

        from boxsegliver_tpu.ops.labeling import largest_error_click

        model = self.model
        t_max = self.max_iters
        thresh = self.dice_thresh
        sigma = self.stddev
        gc = self.guide_channel
        flips = [()]
        if self.tta:
            # host flip axes (1,2,3) on [1,d,h,w,*] == (0,1,2) on [d,h,w]
            flips = [(), (0,), (1,), (2,), (0, 1), (0, 2), (1, 2), (0, 1, 2)]
        iz = jnp.arange(d, dtype=jnp.float32)[:, None, None]
        iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        ix = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        valid = ((iz < vd) & (iy < vh) & (ix < vw))

        def click_gauss(coords):
            d2 = ((iz - coords[0]) ** 2 + (iy - coords[1]) ** 2
                  + (ix - coords[2]) ** 2)
            return jnp.exp(-d2 / (2.0 * sigma ** 2))

        def run(variables, images, labels):
            # images [d,h,w,c] f32 (padded, z-scored), labels [d,h,w] bool
            init = (jnp.zeros((d, h, w), bool),      # pred
                    jnp.zeros((d, h, w), jnp.float32),  # fg guide (max)
                    jnp.zeros((d, h, w), jnp.float32),  # bg guide (max)
                    jnp.float32(0.0),                # dice
                    jnp.int32(0),                    # clicks
                    jnp.bool_(False),                # done
                    jnp.int32(0))                    # t

            def cond(s):
                return (s[-1] < t_max) & ~s[5]

            def body(s):
                pred, fg_g, bg_g, dice, clicks, done, t = s
                coords, fg, has_err = largest_error_click(pred, labels)
                g_new = click_gauss(coords.astype(jnp.float32))
                fg_g = jnp.where(has_err & fg,
                                 jnp.maximum(fg_g, g_new), fg_g)
                bg_g = jnp.where(has_err & ~fg,
                                 jnp.maximum(bg_g, g_new), bg_g)
                clicks = clicks + has_err
                if gc == 2:
                    guide = jnp.stack([fg_g, bg_g], axis=-1)
                else:
                    guide = (fg_g - bg_g)[..., None]
                acc = None
                for axes in flips:
                    xin, gin = images[None], guide[None]
                    for ax in axes:
                        xin = jnp.flip(xin, axis=ax + 1)
                        gin = jnp.flip(gin, axis=ax + 1)
                    logits = model.apply(
                        variables, {"images": xin, "sp_guide": gin},
                        train=False)
                    probs = jax.nn.softmax(logits, axis=-1)
                    for ax in axes:
                        probs = jnp.flip(probs, axis=ax + 1)
                    acc = probs if acc is None else acc + probs
                new_pred = (jnp.argmax(acc[0], axis=-1) > 0) & valid
                tp = jnp.sum(new_pred & labels)
                fp = jnp.sum(new_pred & ~labels)
                fn = jnp.sum(~new_pred & labels)
                denom = (2 * tp + fp + fn).astype(jnp.float32)
                new_dice = jnp.where(denom > 0,
                                     2.0 * tp.astype(jnp.float32) / denom,
                                     0.0)
                pred = jnp.where(has_err, new_pred, pred)
                dice = jnp.where(has_err, new_dice, dice)
                done = ~has_err | (has_err & (new_dice > thresh))
                return (pred, fg_g, bg_g, dice, clicks, done, t + 1)

            out = jax.lax.while_loop(cond, body, init)
            return out[3], out[4]                    # dice, clicks

        return jax.jit(run)

    def refine_case(self, volume: np.ndarray, label: np.ndarray, *,
                    valid_shape=None) -> Dict[str, float]:
        """volume [d,h,w] or [d,h,w,c] f32 (already padded + normalized,
        like the host loop's input), label [d,h,w] (nonzero = lesion)."""
        import jax

        vol = np.asarray(volume, np.float32)
        if vol.ndim == 3:
            vol = vol[..., None]
        lab = np.asarray(label) > 0
        d, h, w = lab.shape
        vd, vh, vw = valid_shape if valid_shape is not None else (d, h, w)
        fn = self._compiled(d, h, w, vol.shape[-1], int(vd), int(vh), int(vw))
        dice, clicks = fn(self._variables, jax.device_put(vol),
                          jax.device_put(lab))
        return {"Dice": float(dice), "clicks": float(clicks)}
