"""In-graph (jittable) connected-component labeling and per-object robust
moments for the interactive guide-propagation state machine.

The reference's interactive eval filters every predicted slice on the host
with scipy (`ndi.label` + per-object numpy loops,
reference DataLoader/Liver/input_pipeline_g.py:1249-1330).  Running that
loop per slice costs two tunnel round trips per slice on TPU; these
primitives re-express the same semantics as fixed-shape XLA ops so the whole
Forward/Backward sweep compiles into one `lax.scan` dispatch
(interactive/device_sweep.py).

Semantics pinned against the host oracles by tests/test_labeling.py:
- `label_components`: 4-connectivity labels whose values are the component's
  first raster pixel (linear index) — the same ordering `ndi.label` assigns.
- `object_moments`: median center + 1.4826*MAD stddev per object, exactly
  `array_kits.compute_robust_moments` (medians over integer pixel
  coordinates are computed from 1-D histograms, which is exact).
- `wu_ascent`: monotone-ascent test along Xiaolin-Wu line pixels
  (`array_kits.ascent_line`).  Deviation: the host accumulates the line's
  y-intercept in float64 (`intery += gradient`); here it is evaluated in
  closed form in float32.  The pixel chain can differ only where the exact
  intercept lands on an integer boundary — end points are handled exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MAD_TO_STD = 1.4826  # array_kits._MAD_TO_STD (reference utils/array_kits.py)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def _segmented_min(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-row forward segmented min-scan: within each contiguous True run of
    `mask` (last axis), each element becomes the min of the run's prefix."""
    starts = jnp.logical_not(mask)
    starts = starts | jnp.pad(starts[..., :-1], [(0, 0)] * (mask.ndim - 1)
                              + [(1, 0)], constant_values=True)

    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    out, _ = jax.lax.associative_scan(combine, (vals, starts), axis=-1)
    return out


def _sweep(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """One bidirectional propagation pass along EVERY array axis (cross
    connectivity in any rank)."""
    for ax in range(labels.ndim):
        lt = jnp.moveaxis(labels, ax, -1)
        mt = jnp.moveaxis(mask, ax, -1)
        lt = _segmented_min(lt, mt)
        lt = _segmented_min(lt[..., ::-1], mt[..., ::-1])[..., ::-1]
        labels = jnp.moveaxis(lt, -1, ax)
    return labels


def label_components(mask: jnp.ndarray) -> jnp.ndarray:
    """Cross-connectivity (ndi connectivity=1) connected components of a
    bool mask of ANY rank (2D slices, 3D volumes).

    Returns int32: each foreground pixel carries the linear index
    (raster/C order) of its component's first raster pixel; background
    pixels carry mask.size.  Label VALUES therefore sort in the same order
    `ndi.label` numbers components (first-raster-pixel order) —
    `ordered_seeds` relies on this.  Min-propagation runs to fixpoint
    (`lax.while_loop`), so arbitrarily shaped components are exact.
    """
    size = mask.size
    sentinel = jnp.int32(size)
    seeds = jnp.where(mask,
                      jnp.arange(size, dtype=jnp.int32).reshape(mask.shape),
                      sentinel)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        new = _sweep(labels, mask)
        return new, jnp.any(new != labels)

    # one unconditional sweep, then iterate while anything changes
    first = _sweep(seeds, mask)
    labels, _ = jax.lax.while_loop(cond, body,
                                   (first, jnp.any(first != seeds)))
    return labels


def ordered_seeds(labels: jnp.ndarray, max_objects: int):
    """First-raster-pixel seeds of each component in `ndi.label` order.

    labels: output of `label_components`.  Returns (seeds [K] int32 padded
    with h*w, n_objects int32).  n_objects counts ALL components (callers
    compare against K to detect overflow)."""
    h, w = labels.shape
    sentinel = jnp.int32(h * w)
    flat = labels.reshape(-1)
    lin = jnp.arange(h * w, dtype=jnp.int32)
    is_seed = (flat == lin) & (flat != sentinel)
    vals = jnp.where(is_seed, lin, sentinel)
    seeds = jax.lax.top_k(-vals, max_objects)[0] * -1   # ascending k smallest
    return seeds.astype(jnp.int32), jnp.sum(is_seed).astype(jnp.int32)


def largest_error_click(pred: jnp.ndarray, label: jnp.ndarray):
    """In-graph `interactive.clicks.next_click_from_error` for a 2D slice or
    a 3D volume.

    pred/label: bool, any rank.  Returns (coords [ndim] int32, is_fg bool,
    has_error bool); coords are meaningful only when has_error.  Exactly the
    host semantics (pinned by tests/test_labeling.py): largest
    cross-connected error component, eroded (cross, zero border) to its
    terminal non-empty core, rounded center of mass — falling back to the
    core's middle raster pixel when the rounded center misses the component.
    """
    shape = pred.shape
    nd = pred.ndim
    size = pred.size
    error = pred ^ label
    has_error = jnp.any(error)
    labels = label_components(error)
    # component sizes: histogram over label values (sentinel bin dropped)
    sizes = jnp.zeros(size + 1, jnp.int32).at[labels.reshape(-1)].add(
        1, mode="drop")
    largest = jnp.argmax(sizes[:-1]).astype(jnp.int32)
    comp = labels == largest

    def erode(m):
        mp = jnp.pad(m, 1)
        out = mp[(slice(1, -1),) * nd]
        for ax in range(nd):
            lo = tuple(slice(0, -2) if a == ax else slice(1, -1)
                       for a in range(nd))
            hi = tuple(slice(2, None) if a == ax else slice(1, -1)
                       for a in range(nd))
            out = out & mp[lo] & mp[hi]
        return out

    core = jax.lax.while_loop(
        lambda m: jnp.sum(erode(m)) >= 1, erode, comp)
    n = jnp.maximum(core.sum(), 1).astype(jnp.float32)
    cf = core.astype(jnp.float32)
    com = []
    for ax in range(nd):
        iota = jnp.arange(shape[ax], dtype=jnp.float32).reshape(
            tuple(shape[ax] if a == ax else 1 for a in range(nd)))
        com.append(jnp.round((cf * iota).sum() / n).astype(jnp.int32))
    coords = jnp.stack([jnp.clip(c, 0, shape[a] - 1)
                        for a, c in enumerate(com)])
    strides = np.cumprod((shape[1:] + (1,))[::-1])[::-1].astype(np.int32)
    flat_idx = jnp.sum(coords * jnp.asarray(strides))
    on_comp = comp.reshape(-1)[flat_idx]
    # fallback: middle raster pixel of the core (host: pts[len(pts)//2])
    cum = jnp.cumsum(core.reshape(-1))
    mid = jnp.argmax(cum > (core.sum() // 2)).astype(jnp.int32)
    mid_coords = []
    rem = mid
    for s in strides:
        mid_coords.append(rem // s)
        rem = rem % s
    coords = jnp.where(on_comp, coords, jnp.stack(mid_coords))
    is_fg = label.reshape(-1)[jnp.sum(coords * jnp.asarray(strides))]
    return coords, is_fg, has_error


# ---------------------------------------------------------------------------
# per-object robust moments (median + MAD) from coordinate histograms
# ---------------------------------------------------------------------------

def _median_from_counts(vals: jnp.ndarray, counts: jnp.ndarray,
                        rank: jnp.ndarray) -> jnp.ndarray:
    """Rank-selection over a weighted multiset: smallest v in `vals` [K, B]
    whose cumulative count (of elements <= v, weighted by `counts`) exceeds
    `rank` [K].  Exact for the integer/half-integer values used here."""
    le = vals[:, None, :] <= vals[:, :, None]               # [K, j, y]
    cnt = jnp.einsum("kjy,ky->kj", le.astype(jnp.float32), counts)
    ok = (cnt > rank[:, None].astype(jnp.float32)) & (counts > 0)
    return jnp.min(jnp.where(ok, vals, jnp.inf), axis=-1)


def _axis_median_mad(counts: jnp.ndarray, n: jnp.ndarray):
    """counts: [K, B] pixel counts per integer coordinate; n: [K] totals.
    Returns (median [K], mad [K]) with numpy's even-count averaging."""
    k, b = counts.shape
    coords = jnp.tile(jnp.arange(b, dtype=jnp.float32)[None], (k, 1))
    r1 = jnp.maximum((n - 1) // 2, 0).astype(jnp.float32)
    r2 = (n // 2).astype(jnp.float32)
    med = (_median_from_counts(coords, counts, r1)
           + _median_from_counts(coords, counts, r2)) / 2.0
    dev = jnp.abs(coords - med[:, None])
    mad = (_median_from_counts(dev, counts, r1)
           + _median_from_counts(dev, counts, r2)) / 2.0
    return med, mad


def object_moments(obj_masks: jnp.ndarray, min_std: float = 0.0):
    """Robust moments of K fixed-shape binary objects at once.

    obj_masks: [K, h, w] bool.  Returns (centers [K, 2] f32 ij, stds [K, 2]
    f32) matching `array_kits.compute_robust_moments(indexing="ij")` per
    object; empty slots yield (-1, -1) rows.  Histogram rank selection makes
    the medians exact without any [K, h*w] sort.
    """
    m = obj_masks.astype(jnp.float32)
    rowc = m.sum(axis=2)                                    # [K, h]
    colc = m.sum(axis=1)                                    # [K, w]
    n = rowc.sum(axis=1).astype(jnp.int32)
    cy, mad_y = _axis_median_mad(rowc, n)
    cx, mad_x = _axis_median_mad(colc, n)
    center = jnp.stack([cy, cx], axis=-1)
    std = jnp.maximum(_MAD_TO_STD * jnp.stack([mad_y, mad_x], axis=-1),
                      jnp.float32(min_std))
    empty = (n == 0)[:, None]
    center = jnp.where(empty, -1.0, center)
    std = jnp.where(empty, -1.0, std)
    return center, std


# ---------------------------------------------------------------------------
# Xiaolin-Wu monotone-ascent line test
# ---------------------------------------------------------------------------

def wu_ascent(img: jnp.ndarray, peak: jnp.ndarray, centers: jnp.ndarray):
    """Vectorized `array_kits.ascent_line(img, px, py, cx, cy)` for one peak
    against M candidate centers.

    img: [h, w] f32; peak: [2] int32 (ij); centers: [M, 2] int32 (ij).
    Returns [M] bool: True when img is monotonically non-decreasing along
    the Wu line pixel chain from peak to center.  Rows where center == peak
    return True (the host checks pointwise equality before calling the line
    test, reference input_pipeline_g.py:1295-1302).
    """
    h, w = img.shape
    length = max(h, w)
    py, px = peak[0], peak[1]
    cy, cx = centers[:, 0], centers[:, 1]

    # host arg order: (x0, y0) = peak in xy, (x1, y1) = center in xy
    steep = jnp.abs(cy - py) > jnp.abs(cx - px)
    a0 = jnp.where(steep, py, px)
    b0 = jnp.where(steep, px, py)
    a1 = jnp.where(steep, cy, cx)
    b1 = jnp.where(steep, cx, cy)
    fwd = a0 <= a1                       # host flips so the low-a end leads
    la0 = jnp.where(fwd, a0, a1)
    lb0 = jnp.where(fwd, b0, b1)
    la1 = jnp.where(fwd, a1, a0)
    lb1 = jnp.where(fwd, b1, b0)
    da = la1 - la0
    grad = jnp.where(da > 0,
                     (lb1 - lb0).astype(jnp.float32)
                     / jnp.maximum(da, 1).astype(jnp.float32), 1.0)

    # Reparametrize on the ABSOLUTE major-axis coordinate a: a Wu line visits
    # each major-axis position at most once, at minor coordinate
    # b(a) = floor(lb0 + grad*(a - la0)).  The line-pixel values are then a
    # per-position one-hot CONTRACTION against the image instead of a
    # scattered gather — the standard TPU embedding-lookup idiom.  Exact for
    # f32 (one-hot rows select a single value; 0*x terms vanish); measured
    # ~100x faster than the 2-D gather XLA emits otherwise (PERF.md run_g).
    a = jnp.arange(length, dtype=jnp.int32)                  # [L] absolute
    t = a[None] - la0[:, None]                               # [M, L]
    bf = lb0[:, None].astype(jnp.float32) \
        + grad[:, None] * t.astype(jnp.float32)
    bvals = jnp.floor(bf).astype(jnp.int32)
    # end points are exact integers on the host; pin them against f32 error
    bvals = jnp.where(t == 0, lb0[:, None], bvals)
    bvals = jnp.where(t == da[:, None], lb1[:, None], bvals)
    bvals = jnp.clip(bvals, 0, jnp.where(steep, w - 1, h - 1)[:, None])

    pad = [(0, 0), (0, length - w)]
    img_a = jnp.pad(img, pad) if length > w else img         # [h, L]
    pad_t = [(0, 0), (0, length - h)]
    img_t = jnp.pad(img.T, pad_t) if length > h else img.T   # [w, L]
    oh_ns = (bvals[:, :, None]
             == jnp.arange(h, dtype=jnp.int32)[None, None]).astype(img.dtype)
    oh_st = (bvals[:, :, None]
             == jnp.arange(w, dtype=jnp.int32)[None, None]).astype(img.dtype)
    v_ns = jnp.einsum("mab,ba->ma", oh_ns, img_a)   # non-steep: b=y, a=x
    v_st = jnp.einsum("mab,ba->ma", oh_st, img_t)   # steep:     b=x, a=y
    v = jnp.where(steep[:, None], v_st, v_ns)                # [M, L]

    pair_ok = (t[:, :-1] >= 0) & (t[:, 1:] <= da[:, None])   # both ends valid
    diff = v[:, 1:] - v[:, :-1]
    asc = jnp.all(jnp.where(pair_ok, diff >= 0, True), axis=1)
    desc = jnp.all(jnp.where(pair_ok, diff <= 0, True), axis=1)
    ok = jnp.where(fwd, asc, desc)       # traversal runs peak -> center
    same = (cy == py) & (cx == px)
    return jnp.where(same, True, ok)
