"""3-D brick-chart fused kernel: parity against the general XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vpic_tpu as vt
from vpic_tpu.ops import pallas_push3d as PP3


def build(pallas, walls=False):
    sim = vt.Simulation(seed=5)
    sim.define_units(1.0, 1.0)
    n = 16
    g0 = vt.partition_periodic_box(0, 0, 0, 1, 1, 1, n, n, n)
    sim.define_timestep(0.6 * g0.courant_length())
    sim.define_periodic_grid((0, 0, 0), (1, 1, 1), (n, n, n))
    if walls:
        sim.set_domain_field_bc(vt.BOUNDARY(-1, 0, 0), vt.PEC)
        sim.set_domain_field_bc(vt.BOUNDARY(1, 0, 0), vt.PEC)
        sim.set_domain_particle_bc(vt.BOUNDARY(-1, 0, 0),
                                   vt.REFLECT_PARTICLES)
        sim.set_domain_particle_bc(vt.BOUNDARY(1, 0, 0),
                                   vt.REFLECT_PARTICLES)
        sim.set_domain_field_bc(vt.BOUNDARY(0, 0, -1), vt.ABSORB_FIELDS)
        sim.set_domain_field_bc(vt.BOUNDARY(0, 0, 1), vt.ABSORB_FIELDS)
        sim.set_domain_particle_bc(vt.BOUNDARY(0, 0, -1),
                                   vt.ABSORB_PARTICLES)
        sim.set_domain_particle_bc(vt.BOUNDARY(0, 0, 1),
                                   vt.ABSORB_PARTICLES)
    sim.define_material("vacuum", 1.0)
    sim.define_field_array(damp=0.0)
    el = sim.define_species("e", -1.0, 1.0, 24000, -1, 4, 1)
    rng = np.random.default_rng(0)
    for k in range(5000):
        sim.inject_particle(el, *rng.uniform(0.01, 0.99, 3),
                            *rng.normal(0, 0.4, 3), 1.0)
    sim.set_region_field(vt.everywhere,
                         ey=lambda x, y, z: 0.05 * np.cos(2 * np.pi * x),
                         bz=lambda x, y, z: 0.05 * np.cos(2 * np.pi * x))
    sim.use_pallas = pallas
    return sim


def test_supports3d():
    sim = build(False)
    assert PP3.supports3d(sim.grid, 24000)
    g2 = vt.partition_periodic_box(0, 0, 0, 1, 1, 1, 12, 16, 16)
    assert not PP3.supports3d(g2)       # 12 % 8 != 0


@pytest.mark.parametrize("walls", [False, True])
def test_fused3d_matches_xla(walls):
    outs = []
    for pallas in (False, True):
        sim = build(pallas, walls)
        st = sim.initialize()
        adv = jax.jit(sim.make_advance())
        # few steps: the deposit-precision difference (bf16 hi/lo vs
        # f32) amplifies chaotically past ~5 steps in this hot deck
        for _ in range(4):
            st = adv(st)
        outs.append((np.asarray(sim.energies(st)),
                     int(np.asarray(st.species[0].live).sum()),
                     float(np.asarray(st.fields.rhob).sum())))
    (e0, n0, r0), (e1, n1, r1) = outs
    assert n0 == n1
    assert abs(r0 - r1) <= 1e-5 * abs(r0) + 1e-6
    assert np.abs(e0 - e1).max() / np.abs(e0).max() < 2e-5


def test_chart_roundtrip():
    """to_chart_T / fold_chart_acc are exact adjoints on interior cells."""
    sim = build(False)
    g = sim.grid
    rng = np.random.default_rng(1)
    flat = jnp.asarray(rng.normal(size=(4, g.nv)).astype(np.float32))
    chart = PP3.to_chart_T(flat, g)
    # every canonical cell appears in its home brick interior exactly once
    # plus up to 7 halo copies; fold of the chart of ones counts copies
    ones = PP3.to_chart_T(jnp.ones((1, g.nv)), g)
    folded = PP3.fold_chart_acc(ones, g).reshape(g.NZ, g.NY, g.NX)
    interior = np.asarray(folded)[1:-1, 1:-1, 1:-1]
    assert interior.min() >= 1.0


def test_fused3d_sharded_matches_xla():
    """3-D brick-chart kernel under shard_map: remote crossers are
    pre-flagged, routed through boundary_p migration, and the result
    matches the sharded XLA path."""
    outs = []
    for pallas in (False, True):
        sim = vt.Simulation(seed=7)
        sim.define_units(1.0, 1.0)
        n = 16
        g0 = vt.partition_periodic_box(0, 0, 0, 1, 1, 1, n, n, n,
                                       1, 2, 1)
        sim.define_timestep(0.6 * g0.courant_length())
        sim.define_periodic_grid((0, 0, 0), (1, 1, 1), (n, n, n),
                                 topology=(1, 2, 1))
        sim.define_material("vacuum", 1.0)
        sim.define_field_array(damp=0.0)
        el = sim.define_species("e", -1.0, 1.0, 24000, -1, 4, 1)
        rng = np.random.default_rng(0)
        for k in range(4000):
            sim.inject_particle(el, *rng.uniform(0.01, 0.99, 3),
                                *rng.normal(0, 0.4, 3), 1.0)
        sim.set_region_field(
            vt.everywhere, ey=lambda x, y, z: 0.05 * np.cos(2 * np.pi * x),
            bz=lambda x, y, z: 0.05 * np.cos(2 * np.pi * x))
        sim.use_pallas = pallas
        st = sim.initialize()
        step = sim.make_step()
        for _ in range(4):
            st = step(st)
        outs.append((np.asarray(sim.energies(st)),
                     int(np.asarray(st.species[0].live).sum())))
    (e0, n0), (e1, n1) = outs
    assert n0 == n1
    assert np.abs(e0 - e1).max() / np.abs(e0).max() < 2e-5


def build2d(mode, walls=False):
    """2-D deck on a chart-compatible grid (nx%16, ny%8, ny >= 24)."""
    sim = vt.Simulation(seed=6)
    sim.define_units(1.0, 1.0)
    nx, ny = 32, 24
    g0 = vt.partition_periodic_box(0, 0, 0, 1, 0.75, 1 / 32, nx, ny, 1)
    sim.define_timestep(0.6 * g0.courant_length())
    sim.define_periodic_grid((0, 0, 0), (1, 0.75, 1 / 32), (nx, ny, 1))
    if walls:
        sim.set_domain_field_bc(vt.BOUNDARY(-1, 0, 0), vt.PEC)
        sim.set_domain_field_bc(vt.BOUNDARY(1, 0, 0), vt.PEC)
        sim.set_domain_particle_bc(vt.BOUNDARY(-1, 0, 0),
                                   vt.REFLECT_PARTICLES)
        sim.set_domain_particle_bc(vt.BOUNDARY(1, 0, 0),
                                   vt.ABSORB_PARTICLES)
    sim.define_material("vacuum", 1.0)
    sim.define_field_array(damp=0.0)
    el = sim.define_species("e", -1.0, 1.0, 12000, -1, 4, 1)
    rng = np.random.default_rng(1)
    for k in range(4000):
        sim.inject_particle(el, rng.uniform(0.01, 0.99),
                            rng.uniform(0.01, 0.74), 1 / 64,
                            *rng.normal(0, 0.4, 3), 1.0)
    sim.set_region_field(vt.everywhere,
                         ey=lambda x, y, z: 0.05 * np.cos(2 * np.pi * x),
                         bz=lambda x, y, z: 0.05 * np.cos(2 * np.pi * x))
    if mode == "chart":
        sim.use_pallas = True
        sim.pallas_chart2d = True
    elif mode == "general":
        sim.use_pallas = False
    return sim


def test_chart2d_dims():
    sim = build2d("general")
    B, HAL, C, S, used = PP3.chart_dims(sim.grid)
    assert B == (16, 8, 1) and C == (32, 24, 1) and S == 768 == used
    assert PP3.supports3d(sim.grid, 12000)
    # too-small ny for a full chart
    g2 = vt.partition_periodic_box(0, 0, 0, 1, 1, 1, 32, 16, 1)
    assert not PP3.supports3d(g2)


def test_chart2d_adjoint():
    """to_chart_T / fold_chart_acc with deep halos are exact adjoints:
    folding an all-ones chart returns each cell's chart multiplicity, and
    a random table round-trips."""
    sim = build2d("general")
    g = sim.grid
    rng = np.random.default_rng(0)
    nvp = ((g.nv + 127) // 128) * 128
    flat = jnp.asarray(rng.normal(size=(2, nvp)).astype(np.float32))
    chart = PP3.to_chart_T(flat, g)
    # gather-scatter consistency: fold(chart == broadcast of flat) sums
    # each canonical interior cell exactly its multiplicity times
    ones = PP3.to_chart_T(jnp.ones((1, nvp)), g)
    folded = PP3.fold_chart_acc(ones, g).reshape(g.NZ, g.NY, g.NX)
    B, HAL, C, S, used = PP3.chart_dims(g)
    # interior z=1 plane: every cell appears in (Cx/Bx)*(Cy/By) charts
    mult = (C[0] // B[0]) * (C[1] // B[1])
    # every chart lane folds exactly once -- onto an interior cell, a
    # wrapped interior cell (deep-halo layers), or a canonical ghost
    # (layer-1 halo; folded downstream by fold_ghost_acc_T)
    assert int(folded.sum()) == PP3.nbricks(g) * used
    assert folded[1, 1:-1, 1:-1].max() >= mult
    assert float(np.abs(folded[0]).max()) == 0.0   # z ghosts untouched


@pytest.mark.slow
@pytest.mark.parametrize("walls", [False, True])
def test_chart2d_matches_general(walls):
    outs = []
    for mode in ("general", "chart"):
        sim = build2d(mode, walls)
        state = sim.initialize()
        adv = jax.jit(sim.make_advance())
        for _ in range(4):
            state = adv(state)
        outs.append((sim, state))
    (simg, sg), (simc, sc) = outs
    eg = np.asarray(simg.energies(sg))
    ec = np.asarray(simc.energies(sc))
    np.testing.assert_allclose(ec, eg, rtol=2e-4, atol=1e-6 * eg.max())
    lg = np.asarray(sg.species[0].live)
    lc = np.asarray(sc.species[0].live)
    assert lg.sum() == lc.sum()
    ig = np.sort(np.asarray(sg.species[0].i)[lg])
    ic = np.sort(np.asarray(sc.species[0].i)[lc])
    assert np.array_equal(ig, ic)


def test_chart2d_deep_halo_wrap_exact():
    """Deep halo layers must hold EXACTLY the wrapped cell's table values
    (a one-cell error here pushes seam-crossing particles with the
    neighbor's fields -- caught by review in round 2): fill a table with
    each cell's canonical index and check every chart lane."""
    sim = build2d("general")
    g = sim.grid
    nvp = ((g.nv + 127) // 128) * 128
    vox_val = jnp.arange(nvp, dtype=jnp.float32)[None, :]
    chart = np.asarray(PP3.to_chart_T(vox_val, g))
    B, HAL, C, S, used = PP3.chart_dims(g)
    nbx, nby, _ = PP3._nb(g)
    NX, NY = g.nx + 2, g.ny + 2
    for brick in range(PP3.nbricks(g)):
        bx = brick % nbx
        by = (brick // nbx) % nby
        for ly in range(C[1]):
            for lx in range(C[0]):
                got = chart[0, brick * S + lx + C[0] * ly]
                xi = bx * B[0] + lx - (HAL[0] - 1)
                yi = by * B[1] + ly - (HAL[1] - 1)
                # per-axis: the canonical ghost layer (0, n+1) is used
                # as-is; deeper layers wrap to the interior
                xw = xi if 0 <= xi <= g.nx + 1 else (xi - 1) % g.nx + 1
                yw = yi if 0 <= yi <= g.ny + 1 else (yi - 1) % g.ny + 1
                want = xw + NX * (yw + NY * 1)
                assert got == want, (brick, lx, ly, got, want)
    # and the fold adjoint returns every deep-halo deposit to the SAME
    # wrapped cell the gather read from
    one_lane = jnp.zeros((1, PP3.chart_width(g)), jnp.float32)
    brick, lx, ly = 1, 2, 5      # deep-left halo of brick 1 (x wrap-free)
    one_lane = one_lane.at[0, brick * S + lx + C[0] * ly].set(1.0)
    folded = np.asarray(PP3.fold_chart_acc(one_lane, g)).reshape(
        g.NZ, g.NY, g.NX)
    xi = brick % nbx * B[0] + lx - (HAL[0] - 1)
    yi = (brick // nbx) % nby * B[1] + ly - (HAL[1] - 1)
    xw = xi if 0 <= xi <= g.nx + 1 else (xi - 1) % g.nx + 1
    yw = yi if 0 <= yi <= g.ny + 1 else (yi - 1) % g.ny + 1
    assert folded[1, yw, xw] == 1.0 and folded.sum() == 1.0


def test_brick_sort_home_shape_nonmultiple_capacity():
    """Regression: the home map must have ceil(capacity/1024) blocks even
    for capacities that are not a multiple of 1024 with the extent path
    active (lax.cond/scan carries are shape-strict against the
    deck-initialized ceil shape)."""
    sim = build(False)
    g = sim.grid
    sp = sim.initialize().species[0]
    cap = 24000          # 24000 % 1024 != 0
    assert sp.capacity == cap and cap % 1024
    want_blocks = (cap + 1023) // 1024
    for extent in (0, 5000):
        sorted_sp, home = PP3.brick_sort_p_home(sp, g, extent=extent)
        assert home.shape == (want_blocks,)
        # content preserved: same live multiset of voxel indices
        a = np.sort(np.asarray(sp.i)[np.asarray(sp.live)])
        b = np.sort(np.asarray(sorted_sp.i)[np.asarray(sorted_sp.live)])
        assert np.array_equal(a, b)
