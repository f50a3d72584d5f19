"""Fused Pallas push path: exact agreement with the general XLA path
(interpreter mode on CPU), across sort-staleness intervals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpic_tpu.models import harris
from vpic_tpu.ops import interp as I
from vpic_tpu.ops import pallas_push as PP
from vpic_tpu.ops import push as P


@pytest.fixture(scope="module")
def setup():
    p = harris.HarrisParams(nx=16, ny=16, nppc=4, Lx=8.0, Ly=8.0)
    sim = harris.build(p)
    state = sim.initialize()
    return sim, state


def test_supports(setup):
    sim, state = setup
    assert PP.supports(sim.grid)


def test_bucket_sort_groups(setup):
    sim, state = setup
    g = sim.grid
    # full per-lane sort: strictly bucket-monotone over live lanes
    sp = PP.bucket_sort_p(state.species[0], g, pack=1)
    live = np.asarray(sp.live)
    buckets = np.asarray(sp.i)[live] // PP.BUCKET
    assert (np.diff(buckets) >= 0).all()
    assert int(np.asarray(sp.live).sum()) == int(state.species[0].np)
    # quad-row sort: monotone in the per-quad min-bucket key and any
    # member strays at most ~a bucket from it (window-locality contract)
    spq = PP.bucket_sort_p(sp, g, pack=4)
    assert int(np.asarray(spq.live).sum()) == int(state.species[0].np)
    N = spq.capacity
    b = np.where(np.asarray(spq.live),
                 np.asarray(spq.i) // PP.BUCKET,
                 (g.nv + PP.BUCKET - 1) // PP.BUCKET)
    qmin = b.reshape(N // 4, 4).min(axis=1)
    assert (np.diff(qmin) >= 0).all()
    spread = b.reshape(N // 4, 4).max(axis=1) - qmin
    assert spread[b.reshape(N // 4, 4).min(axis=1) < qmin.max()].max() <= 1


def test_single_push_matches_xla(setup):
    sim, state = setup
    g = sim.grid
    sp = P.sort_p(state.species[1])
    fcoef = I.load_interpolator(state.fields, g)
    acc0 = jnp.zeros((g.nv, 12), jnp.float32)
    rhob0 = jnp.zeros(g.nv, jnp.float32)
    res_ref = P.advance_p(sp, fcoef, g, -1.0, 1.0, acc0, rhob0)
    res_fus = PP.advance_p_fused(sp, fcoef, g, -1.0, 1.0, acc0, rhob0)
    live = np.asarray(sp.live)
    # The fused kernel's one-hot matmuls run as hi+lo bf16 pairs (exact
    # one-hot; ~2^-18 relative rounding -- far below the 1/sqrt(nppc)
    # particle shot noise); tolerances reflect that floor, the physics
    # oracle is the energy-gold test.
    for name in ("dx", "dy", "dz", "ux", "uy", "uz"):
        a = np.asarray(getattr(res_ref.species, name))[live]
        b = np.asarray(getattr(res_fus.species, name))[live]
        np.testing.assert_allclose(a, b, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(res_ref.species.i)[live],
                                  np.asarray(res_fus.species.i)[live])
    da, db = np.asarray(res_ref.acc), np.asarray(res_fus.acc)
    assert np.abs(da - db).max() < 1e-5 * max(np.abs(da).max(), 1e-3)


@pytest.mark.parametrize("K", [1, 4])
def test_multistep_deck_matches_xla(K):
    p = harris.HarrisParams(nx=16, ny=16, nppc=4, Lx=8.0, Ly=8.0)
    sim1 = harris.build(p)
    sim1.use_pallas = False
    sim2 = harris.build(p)
    sim2.use_pallas = True
    sim2.pallas_sort_interval = K
    s1, s2 = sim1.initialize(), sim2.initialize()
    st1 = jax.jit(sim1.make_advance())
    st2 = jax.jit(sim2.make_advance())
    for _ in range(10):
        s1, s2 = st1(s1), st2(s2)
    for n in ("jfx", "ex", "ey", "cbz"):
        a = np.asarray(getattr(s1.fields, n))
        b = np.asarray(getattr(s2.fields, n))
        assert np.abs(a - b).max() < 5e-7 + 1e-5 * np.abs(a).max()
    e1 = np.asarray(sim1.energies(s1))
    e2 = np.asarray(sim2.energies(s2))
    assert np.abs(e1 - e2).max() / e1.sum() < 1e-6


def test_bucket_sort_sources_large_nb():
    """The lax.sort-based bucket sort must yield a stable permutation for
    multi-digit bucket counts (nb > 128) at ANY size -- the regression
    class the retired f32 counting sort could fail (cloned/lost lanes)."""
    rng = np.random.default_rng(0)
    for N, nb in ((4096, 300), (20000, 1000)):
        b = rng.integers(0, nb + 1, N).astype(np.int32)
        src = np.asarray(jax.lax.sort(
            (jnp.asarray(b), jax.lax.iota(jnp.int32, N)), num_keys=1,
            is_stable=True)[1])
        assert np.array_equal(np.sort(src), np.arange(N))  # permutation
        bs = b[src]
        assert (np.diff(bs) >= 0).all()                    # sorted
        for key in np.unique(b)[:20]:
            idx = src[bs == key]
            assert (np.diff(idx) > 0).all()                # stable


def test_odd_window_w0_alignment():
    """Forced windows whose HALF is not a multiple of 128 (e.g. 1408, or
    pick_window's 2688 at 128^2) must still produce 128-aligned w0: the
    old (mid//128)*128 - window//2 form left w0 64-misaligned, which
    silently shifts the kernel's h-major table slice by 64 voxels (wrong
    fields for every lane).  Regression: fused path at window 1408 must
    track the XLA path."""
    p = harris.HarrisParams(nx=32, ny=32, nppc=4, Lx=16.0, Ly=16.0)
    sim1 = harris.build(p)
    sim1.use_pallas = False
    sim2 = harris.build(p)
    sim2.use_pallas = True
    sim2.pallas_window = 1408          # 1408 // 2 = 704 = 5.5 * 128
    s1, s2 = sim1.initialize(), sim2.initialize()
    st1 = jax.jit(sim1.make_advance())
    st2 = jax.jit(sim2.make_advance())
    for _ in range(6):
        s1, s2 = st1(s1), st2(s2)
    e1 = np.asarray(sim1.energies(s1))
    e2 = np.asarray(sim2.energies(s2))
    assert np.abs(e1 - e2).max() / e1.sum() < 1e-6


def test_pallas_window_override_validated():
    """A pallas_window that is not a multiple of 128 (or absurdly small)
    must raise instead of silently misaligning the kernel's h-major table
    slice (the d9cf69d bug class)."""
    p = harris.HarrisParams(nx=16, ny=16, nppc=4, Lx=8.0, Ly=8.0)
    for bad in (200, 1337, 128):
        sim = harris.build(p)
        sim.use_pallas = True
        sim.pallas_window = bad
        with pytest.raises(ValueError, match="pallas_window"):
            sim.make_advance()
