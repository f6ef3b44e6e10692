"""Device geodesic raster scan (ops/geodesic.py) vs the native C++ oracle
(csrc geodesic2d_raster_scan), plus the min-plus linearity the incremental
click update in interactive/device_refine.py relies on."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boxsegliver_tpu.csrc import geodesic_available, geodesic_distance
from boxsegliver_tpu.ops.geodesic import geodesic2d, geodesic_guide

pytestmark = pytest.mark.skipif(not geodesic_available(),
                                reason="native build failed")


@pytest.mark.parametrize("lamb", [1.0, 0.5, 0.0])
@pytest.mark.parametrize("seed", [0, 3])
def test_geodesic2d_matches_csrc(lamb, seed):
    rng = np.random.RandomState(seed)
    img = rng.randn(40, 56).astype(np.float32)
    seeds = np.zeros((40, 56), np.uint8)
    for _ in range(3):
        seeds[rng.randint(40), rng.randint(56)] = 1
    ref = geodesic_distance(img, seeds, lamb=lamb, iterations=4)
    got = np.asarray(jax.jit(geodesic2d, static_argnums=(3,))(
        jnp.asarray(img), jnp.asarray(seeds), lamb, 4))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


def test_geodesic2d_odd_shape_single_iter():
    rng = np.random.RandomState(1)
    img = rng.randn(17, 23).astype(np.float32)
    seeds = np.zeros((17, 23), np.uint8)
    seeds[3, 19] = 1
    ref = geodesic_distance(img, seeds, lamb=1.0, iterations=1)
    got = np.asarray(geodesic2d(jnp.asarray(img), jnp.asarray(seeds), 1.0, 1))
    finite = np.isfinite(ref)
    assert (np.isfinite(np.asarray(got)) == finite).all()
    np.testing.assert_allclose(got[finite], ref[finite], atol=1e-4)


def test_geodesic_min_plus_linearity():
    """dist(A ∪ B) == min(dist(A), dist(B)) — the identity that lets the
    device refiner fold one new click per round into a carried field."""
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(32, 32).astype(np.float32))
    sa = np.zeros((32, 32), bool)
    sb = np.zeros((32, 32), bool)
    sa[5, 7] = True
    sb[25, 20] = True
    da = geodesic2d(img, jnp.asarray(sa), 1.0, 4)
    db = geodesic2d(img, jnp.asarray(sb), 1.0, 4)
    dab = geodesic2d(img, jnp.asarray(sa | sb), 1.0, 4)
    np.testing.assert_allclose(np.asarray(dab),
                               np.minimum(np.asarray(da), np.asarray(db)),
                               atol=1e-4)


def test_geodesic_guide_no_seeds_is_zero():
    img = jnp.zeros((16, 16), jnp.float32)
    g = geodesic_guide(img, jnp.zeros((16, 16), bool))
    assert not np.isnan(np.asarray(g)).any()
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_render_geodesic_eval_guide_convention():
    """Host eval guide = raw distance on the 2x grid, resized back
    (training convention, sampler_inter._geodesic_maps)."""
    from boxsegliver_tpu.interactive.refine import render_geodesic_eval_guide

    rng = np.random.RandomState(4)
    img = rng.randn(32, 32).astype(np.float32)
    assert (render_geodesic_eval_guide(img, []) == 0).all()
    g = render_geodesic_eval_guide(img, [(10, 12)])
    assert g.shape == (32, 32)
    # distance at the click lands near zero; far corner is larger
    assert g[10, 12] < g[31, 31]
