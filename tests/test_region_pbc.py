"""Per-voxel custom particle BCs: interior region surfaces.

The reference encodes BCs per voxel-face in grid->neighbor[6*nv]
(grid.h:116-121, decoded at boundary_p.cc:196-255), letting decks attach
absorb/reflect/reflux surfaces to interior region boundaries.  Here
set_region_particle_bc rasterizes the region surface into a flat (nv*6,)
code array consumed by streak_walk (general path) and, on the fused path,
by the kernel's mark-row pre-flag + exact outlier replay.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vpic_tpu as vt
from vpic_tpu.grid import ABSORB_PARTICLES, REFLECT_PARTICLES


def build(use_pallas, seed=2, n=2000, bc=ABSORB_PARTICLES,
          topology=(1, 1, 1)):
    sim = vt.Simulation(seed=seed)
    sim.define_units(1.0, 1.0)
    g0 = vt.partition_periodic_box(0, 0, 0, 1.0, 1.0, 1.0 / 32,
                                   32, 32, 1)
    sim.define_timestep(0.7 * g0.courant_length())
    sim.define_periodic_grid((0, 0, 0), (1.0, 1.0, 1.0 / 32), (32, 32, 1),
                             topology)
    sim.define_material("vacuum", 1.0)
    sim.define_field_array(damp=0.0)
    ele = sim.define_species("electron", -1.0, 1.0, 4096 // topology[1])
    rng = np.random.default_rng(0)
    k = 0
    while k < n:
        x, y = rng.uniform(0, 1), rng.uniform(0, 1)
        u = rng.normal(0, 0.3, 3)
        if 0.4 < x < 0.6 and 0.4 < y < 0.6:
            continue                      # never start inside the region
        sim.inject_particle(ele, x, y, 1.0 / 64, *u, w=1.0)
        k += 1
    sim.set_region_particle_bc(
        lambda x, y, z: (0.4 < x < 0.6) and (0.4 < y < 0.6), bc)
    sim.use_pallas = use_pallas
    return sim


def run(sim, n_steps):
    state = sim.initialize()
    step = sim.make_step()
    for _ in range(n_steps):
        state = step(state)
    return state


def test_interior_absorber_general_path():
    """Interior absorbing box: particles vanish, their charge lands in
    rhob (reference absorb semantics, boundary absorb + accumulate_rhob),
    and nobody ever occupies an interior region cell."""
    sim = build(use_pallas=False)
    state = sim.initialize()
    np0 = int(np.asarray(state.species[0].np))
    rb0 = float(np.asarray(state.fields.rhob).sum())
    adv = jax.jit(sim.make_advance())
    for _ in range(40):
        state = adv(state)
    np1 = int(np.asarray(state.species[0].np))
    rb1 = float(np.asarray(state.fields.rhob).sum())
    absorbed = np0 - np1
    assert absorbed > 5, "interior absorber never fired"
    # every absorbed electron deposits the same negative charge into rhob
    # (deposit_rhob's normalization convention is pinned by the gold
    # tests; here we check consistency and sign)
    g = sim.grid
    per = (rb1 - rb0) / absorbed
    inv_dv = 1.0 / (g.dx * g.dy * g.dz)
    assert -4.0 * inv_dv < per < -0.5 * inv_dv
    # nobody inside the region
    live = np.asarray(state.species[0].live)
    vox = np.asarray(state.species[0].i)[live]
    zi, r = np.divmod(vox, g.sz)
    yi, xi = np.divmod(r, g.sy)
    inside = ((xi - 0.5) * g.dx > 0.4 + g.dx) & ((xi - 0.5) * g.dx < 0.6 - g.dx) \
        & ((yi - 0.5) * g.dy > 0.4 + g.dy) & ((yi - 0.5) * g.dy < 0.6 - g.dy)
    assert not inside.any()


def test_interior_reflector_conserves_particles():
    sim = build(use_pallas=False, bc=REFLECT_PARTICLES)
    state = run(sim, 40)
    assert int(np.asarray(state.species[0].np)) == 2000


@pytest.mark.slow
def test_fused_matches_general_with_interior_absorber():
    """Fused path (mark-row pre-flag + outlier replay) tracks the general
    path: identical absorb counts, deposits within the fused kernel's
    documented hi/lo-bf16 rounding."""
    a = run(build(use_pallas=False), 3)
    b = run(build(use_pallas=True), 3)
    assert int(np.asarray(a.species[0].np)) == int(np.asarray(b.species[0].np))
    ra, rb = np.asarray(a.fields.rhob), np.asarray(b.fields.rhob)
    np.testing.assert_allclose(rb, ra, atol=2e-6 * np.abs(ra).max())
    ea, eb = np.asarray(a.fields.ex), np.asarray(b.fields.ex)
    assert np.abs(ea - eb).max() <= 5e-5 * np.abs(ea).max()


def test_interior_handler_tally():
    """A boundary_ops handler attached to an interior surface: dispatched
    through boundary_p with pend = CUSTOM_BASE + 6 + 6h + face, tallies
    carried in the jit-scanned diag."""
    from vpic_tpu import boundary_ops as BO
    sim = build(use_pallas=False, bc=BO.absorb_tally())
    state = sim.initialize()
    np0 = int(np.asarray(state.species[0].np))
    adv = jax.jit(sim.make_advance())
    for _ in range(40):
        state = adv(state)
    np1 = int(np.asarray(state.species[0].np))
    total = sum(BO.tally_of(state.diag, "electron", 6 + f)
                for f in range(6))
    assert np0 - np1 > 5
    assert total == np0 - np1


@pytest.mark.slow
def test_interior_absorber_sharded_matches_single():
    """VERDICT round-2 item 6: an interior absorbing surface on a (1,2,1)
    mesh conserves what the single-device run conserves."""
    s1 = run(build(use_pallas=False), 12)
    s2 = run(build(use_pallas=False, topology=(1, 2, 1)), 12)
    n1 = int(np.asarray(s1.species[0].np).sum())
    n2 = int(np.asarray(s2.species[0].np).sum())
    assert n1 == n2


def test_fused_corner_crossing_hits_interior_surface():
    """A lane crossing +x then +y in ONE step passes THROUGH the cell
    bordering the region and must still see the region face (round-2
    review: the kernel pre-flag read only the START cell's mark, so such
    lanes leaked through interior surfaces on the fused path; the mark
    is now dilated by one cell)."""
    def build_one(use_pallas):
        sim = vt.Simulation(seed=3)
        sim.define_units(1.0, 1.0)
        g0 = vt.partition_periodic_box(0, 0, 0, 1.0, 1.0, 1.0 / 32,
                                       32, 32, 1)
        sim.define_timestep(0.7 * g0.courant_length())
        sim.define_periodic_grid((0, 0, 0), (1.0, 1.0, 1.0 / 32),
                                 (32, 32, 1))
        sim.define_material("vacuum", 1.0)
        sim.define_field_array(damp=0.0)
        ele = sim.define_species("electron", -1.0, 1.0, 1024)
        dx = 1.0 / 32
        # region = single cell block starting at x,y in [0.5, 0.5625);
        # particle sits in the cell DIAGONALLY below-left of the cell
        # bordering the region corner, aimed at the corner
        x0 = 0.5 - 1.5 * dx     # in cell A, two cells left of the region
        sim.inject_particle(ele, x0 + 0.45 * dx, x0 + 0.40 * dx, 1 / 64,
                            8.0, 9.0, 0.0, w=1.0)   # fast, +x +y
        sim.set_region_particle_bc(
            lambda x, y, z: (0.5 < x < 0.5625) and (0.5 < y < 0.5625),
            ABSORB_PARTICLES)
        sim.use_pallas = use_pallas
        return sim

    outs = {}
    for up in (False, True):
        sim = build_one(up)
        state = sim.initialize()
        adv = jax.jit(sim.make_advance())
        for _ in range(12):
            state = adv(state)
        outs[up] = int(np.asarray(state.species[0].live).sum())
    assert outs[True] == outs[False], \
        f"fused {outs[True]} vs general {outs[False]} survivors"


@pytest.mark.slow
def test_fused3d_interior_absorber_matches_general():
    """VERDICT round-2 item 6: a 3-D deck with set_region_particle_bc
    keeps the fused brick-chart path (the chart table now carries the
    mark row like the 2-D window kernel) and tracks the general path's
    absorb counts exactly."""
    def build3(use_pallas):
        sim = vt.Simulation(seed=5)
        sim.define_units(1.0, 1.0)
        nx, ny, nz = 16, 16, 16
        g0 = vt.partition_periodic_box(0, 0, 0, 1.0, 1.0, 1.0,
                                       nx, ny, nz)
        sim.define_timestep(0.7 * g0.courant_length())
        sim.define_periodic_grid((0, 0, 0), (1.0, 1.0, 1.0),
                                 (nx, ny, nz))
        sim.define_material("vacuum", 1.0)
        sim.define_field_array(damp=0.0)
        ele = sim.define_species("electron", -1.0, 1.0, 2048)
        rng = np.random.default_rng(1)
        k = 0
        while k < 300:
            x, y, z = rng.uniform(0, 1, 3)
            if 0.375 < x < 0.625 and 0.375 < y < 0.625 \
                    and 0.375 < z < 0.625:
                continue                  # never start inside the region
            u = rng.normal(0, 0.3, 3)
            sim.inject_particle(ele, x, y, z, *u, w=1.0)
            k += 1
        sim.set_region_particle_bc(
            lambda x, y, z: (0.375 < x < 0.625) and
            (0.375 < y < 0.625) and (0.375 < z < 0.625),
            ABSORB_PARTICLES)
        sim.use_pallas = use_pallas
        return sim

    outs = {}
    for up in (False, True):
        sim = build3(up)
        if up:
            # the deck must actually take the chart path for this test
            assert sim._fused_mode()[2], "3-D chart path not selected"
        state = sim.initialize()
        adv = jax.jit(sim.make_advance())
        for _ in range(4):
            state = adv(state)
        outs[up] = (int(np.asarray(state.species[0].live).sum()),
                    np.asarray(state.fields.rhob))
    assert outs[True][0] < 300, "interior absorber never fired"
    assert outs[True][0] == outs[False][0], \
        f"fused {outs[True][0]} vs general {outs[False][0]} survivors"
    ra, rb = outs[False][1], outs[True][1]
    np.testing.assert_allclose(rb, ra, atol=2e-6 * max(np.abs(ra).max(),
                                                       1e-30))


@pytest.mark.slow
def test_chart2d_interior_absorber_matches_general():
    """2-D brick-chart kernel (pallas_chart2d=True) with an interior
    absorbing surface: the chart table's mark row + outlier replay must
    track the general path like the window kernel does."""
    def build2(use_pallas):
        sim = vt.Simulation(seed=7)
        sim.define_units(1.0, 1.0)
        nx, ny = 32, 24              # chart-compatible (16x8 bricks)
        g0 = vt.partition_periodic_box(0, 0, 0, 1.0, 0.75, 1.0 / 32,
                                       nx, ny, 1)
        sim.define_timestep(0.7 * g0.courant_length())
        sim.define_periodic_grid((0, 0, 0), (1.0, 0.75, 1.0 / 32),
                                 (nx, ny, 1))
        sim.define_material("vacuum", 1.0)
        sim.define_field_array(damp=0.0)
        ele = sim.define_species("electron", -1.0, 1.0, 2048)
        rng = np.random.default_rng(3)
        k = 0
        while k < 400:
            x = rng.uniform(0, 1)
            y = rng.uniform(0, 0.75)
            if 0.4 < x < 0.6 and 0.3 < y < 0.45:
                continue
            u = rng.normal(0, 0.3, 3)
            sim.inject_particle(ele, x, y, 1.0 / 64, *u, w=1.0)
            k += 1
        sim.set_region_particle_bc(
            lambda x, y, z: (0.4 < x < 0.6) and (0.3 < y < 0.45),
            ABSORB_PARTICLES)
        if use_pallas:
            sim.use_pallas = True
            sim.pallas_chart2d = True
        else:
            sim.use_pallas = False
        return sim

    outs = {}
    for up in (False, True):
        sim = build2(up)
        if up:
            assert sim._fused_mode()[2], "2-D chart path not selected"
        state = sim.initialize()
        adv = jax.jit(sim.make_advance())
        # 30 steps: first absorption fires near step 10 with this load
        # (4 steps was too few for any particle to reach the region).
        for _ in range(30):
            state = adv(state)
        outs[up] = int(np.asarray(state.species[0].live).sum())
    assert outs[True] < 400, "interior absorber never fired"
    assert outs[True] == outs[False], \
        f"chart {outs[True]} vs general {outs[False]} survivors"
