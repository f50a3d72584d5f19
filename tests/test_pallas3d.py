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
