"""Device-resident 2D geodesic distance: the GeodisTK-style raster scan
(reference DataLoader/NF/input_pipeline_g_simply.py:476-489 usage; host
implementation csrc/boxseg_native.cpp::geodesic2d_raster_scan) recast for
TPU.

The raster scan looks hopelessly sequential — every pixel reads neighbors
updated earlier in the SAME pass — but it factors exactly:

- rows form a `lax.scan`: row y reads only the (already final) row y-1
  through the three upper-neighbor candidates;
- within a row, ``d[x] = min(c[x], d[x-1] + w[x])`` is a min-plus affine
  recurrence.  The maps ``f(d) = min(c, d + w)`` compose associatively —
  ``combine(a, b) = (w_a + w_b, min(c_b, c_a + w_b))`` — so a whole row
  solves in log2(w) stages with `lax.associative_scan` (the
  tropical-semiring counterpart of a prefix sum).

The anti-causal (backward) pass is the forward pass on the doubly-flipped
arrays, so one implementation serves both.  The recurrence solved is the
same real-number recurrence as the C++ scan; float rounding differs where
the min-plus sums reassociate (~1e-5 relative — pinned against the C++
oracle in tests/test_guides.py).  Everything stays inside jit and `vmap`s
over leading batch dims, so geodesic guides can render inside the
device-resident interactive refinement loop instead of forcing a host
round trip per click.

3D volumes keep the host C++ path (csrc geodesic3d_raster_scan): a d×h
sequential slice×row scan is latency-bound on TPU and the 3D interactive
loop uses gaussian guides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def _minplus_row(c: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Solve d[x] = min(c[x], d[x-1] + w[x]) along the last axis.

    w[..., 0] must be +inf (x=0 has no left neighbor)."""
    def combine(a, b):
        wa, ca = a
        wb, cb = b
        return wa + wb, jnp.minimum(cb, ca + wb)

    _, d = jax.lax.associative_scan(combine, (w, c), axis=-1)
    return d


def _shift_x(row: jnp.ndarray, dx: int, fill) -> jnp.ndarray:
    """row[x + dx] at position x; out-of-range -> fill (last axis)."""
    if dx == 0:
        return row
    out = jnp.roll(row, -dx, axis=-1)
    if dx > 0:
        return out.at[..., -dx:].set(fill)
    return out.at[..., :(-dx)].set(fill)


def _step(l2: float, dI: jnp.ndarray, lamb) -> jnp.ndarray:
    # csrc: sqrt((1-lamb)*local^2 + lamb*dI^2)
    return jnp.sqrt((1.0 - lamb) * l2 + lamb * dI * dI)


def _forward_pass(img: jnp.ndarray, dist: jnp.ndarray, lamb) -> jnp.ndarray:
    """One causal raster pass over [h, w]: top-left -> bottom-right."""
    img = img.astype(jnp.float32)
    # intra-row left-neighbor weights; x=0 has none
    w_in = _step(1.0, img - _shift_x(img, -1, 0.0), lamb)
    w_in = w_in.at[..., :1].set(_INF)
    img_up = jnp.roll(img, 1, axis=0)  # img[y-1]; row 0 garbage (masked)

    def body(carry, xs):
        d_prev, valid = carry
        d_row, i_row, i_up, w_row = xs
        c = d_row
        for dx, l2 in ((-1, 2.0), (0, 1.0), (1, 2.0)):
            nd = _shift_x(d_prev, dx, _INF)
            ni = _shift_x(i_up, dx, 0.0)
            cand = nd + _step(l2, i_row - ni, lamb)
            c = jnp.minimum(c, jnp.where(valid, cand, _INF))
        d_new = _minplus_row(c, w_row)
        return (d_new, jnp.bool_(True)), d_new

    (_, _), rows = jax.lax.scan(
        body, (jnp.full(img.shape[-1:], _INF), jnp.bool_(False)),
        (dist, img, img_up, w_in))
    return rows


def geodesic2d(img: jnp.ndarray, seeds: jnp.ndarray, lamb: float = 1.0,
               iterations: int = 4) -> jnp.ndarray:
    """Geodesic distance from seed pixels over a [h, w] image.

    Exact device counterpart of csrc geodesic2d_raster_scan (same neighbor
    geometry, pass order, and iteration count; float-reassociation noise
    only).  seeds: bool/int mask of zero-distance pixels."""
    lamb = jnp.float32(lamb)
    dist = jnp.where(seeds.astype(bool), 0.0, _INF)
    img = img.astype(jnp.float32)
    img_r = img[::-1, ::-1]

    def it(_, dist):
        dist = _forward_pass(img, dist, lamb)
        dist = _forward_pass(img_r, dist[::-1, ::-1], lamb)[::-1, ::-1]
        return dist

    return jax.lax.fori_loop(0, iterations, it, dist)


def geodesic_guide(img: jnp.ndarray, seeds: jnp.ndarray, lamb: float = 1.0,
                   iterations: int = 4, scale: float = 10.0) -> jnp.ndarray:
    """exp(-geodesic/scale) click guide (host twin:
    interactive/refine.render_geodesic_guide).  Seedless maps render as
    zeros — exp(-inf) underflows naturally, but guard NaN-free."""
    dist = geodesic2d(img, seeds, lamb, iterations)
    out = jnp.exp(-dist / jnp.maximum(scale, 1e-6))
    return jnp.where(jnp.isfinite(dist), out, 0.0)
