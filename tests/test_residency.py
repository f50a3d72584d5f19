"""Per-brick bucketed residency (ops/residency): parity vs the general
XLA path and vs the per-step-sort chart path, conservation under the
rebucket fallback, and exchange/merge unit behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vpic_tpu as vt
from vpic_tpu.ops import pallas_push3d as PP3
from vpic_tpu.ops import residency as RES

from test_pallas3d import build


def run4(sim):
    st = sim.initialize()
    adv = jax.jit(sim.make_advance())
    for _ in range(4):
        st = adv(st)
    sp = st.species[0]
    live = np.asarray(sp.live)
    return (np.asarray(sim.energies(st)), int(live.sum()),
            float(np.asarray(st.fields.rhob).sum()),
            np.sort(np.asarray(sp.i)[live]))


@pytest.mark.parametrize("walls", [False, True])
def test_residency_matches_xla(walls):
    sim_g = build(False, walls)
    sim_r = build(True, walls)
    sim_r.pallas_residency = True
    assert sim_r._residency_mode()[0]
    (e0, n0, r0, i0) = run4(sim_g)
    (e1, n1, r1, i1) = run4(sim_r)
    assert n0 == n1
    assert abs(r0 - r1) <= 1e-5 * abs(r0) + 1e-6
    assert np.abs(e0 - e1).max() / np.abs(e0).max() < 2e-5
    # 4 steps keep trajectories bit-correlated enough for the voxel
    # multiset to match exactly on this cold deck
    assert np.array_equal(i0, i1)


def test_residency_policy():
    # auto-on for the pure 3-D chart deck
    sim = build(True)
    assert sim._residency_mode()[0]
    assert sim._residency_mode()[1] >= 1
    # any lane-reordering op disqualifies
    sim2 = build(True)
    sim2.collision_ops.append(lambda *a: a)
    assert not sim2._residency_mode()[0]
    # knob off
    sim3 = build(True)
    sim3.pallas_residency = False
    assert not sim3._residency_mode()[0]
    # forcing on an unsupported deck raises
    sim4 = build(True)
    sim4.collision_ops.append(lambda *a: a)
    sim4.pallas_residency = True
    with pytest.raises(ValueError):
        sim4._residency_mode()


def _beam_deck(pallas):
    """1024 particles in ONE cell at a brick edge all streaming +x: every
    lane leaves the brick the same step, overflowing the 128-slot outbox
    -> the rebucket lax.cond must fire and conserve everything."""
    sim = vt.Simulation(seed=5)
    sim.define_units(1.0, 1.0)
    n = 16
    g0 = vt.partition_periodic_box(0, 0, 0, 1, 1, 1, n, n, n)
    sim.define_timestep(0.6 * g0.courant_length())
    sim.define_periodic_grid((0, 0, 0), (1, 1, 1), (n, n, n))
    sim.define_material("vacuum", 1.0)
    sim.define_field_array(damp=0.0)
    el = sim.define_species("e", -1.0, 1.0, 24000, -1, 4, 1)
    rng = np.random.default_rng(0)
    for k in range(1024):
        sim.inject_particle(el, 7.9 / 16, rng.uniform(0.01, 0.99),
                            rng.uniform(0.01, 0.99), 50.0, 0.0, 0.0, 1.0)
    sim.use_pallas = pallas
    if pallas:
        sim.pallas_residency = True
        assert sim._residency_mode()[0]
    return sim


def test_rebucket_on_outbox_overflow():
    outs = []
    for pallas in (True, False):
        sim = _beam_deck(pallas)
        st = sim.initialize()
        adv = jax.jit(sim.make_advance())
        for _ in range(3):
            st = adv(st)
            assert int(np.asarray(st.species[0].live).sum()) == 1024
        live = np.asarray(st.species[0].live)
        outs.append(np.sort(np.asarray(st.species[0].i)[live]))
    assert np.array_equal(outs[0], outs[1])


def test_residency_layout_invariant():
    """After every step each live lane is interior to its home brick
    (the invariant the incremental exchange maintains)."""
    sim = build(True)
    sim.pallas_residency = True
    st = sim.initialize()
    adv = jax.jit(sim.make_advance())
    g = sim.grid
    for _ in range(3):
        st = adv(st)
    sp = st.species[0]
    home = np.asarray(st.diag["_chart_home0"])
    E = len(home) * 1024            # residency extent (sliced layout)
    live = np.asarray(sp.live)
    assert not live[E:].any()       # all live lanes inside the extent
    br = np.asarray(PP3.brick_of(jnp.maximum(sp.i, 1), g))[:E]
    hl = np.repeat(home, 1024)
    lv = live[:E]
    assert (br[lv] == hl[lv]).all()
    assert int(st.diag["_res_valid"]) == 1
    # live lanes are packed at the front of every block
    for row in lv.reshape(-1, 1024):
        n = row.sum()
        assert row[:n].all()


def test_plan_exchange_routes_and_allocates():
    """Unit test of the routing/allocation math against a numpy oracle."""
    sim = build(False)
    g = sim.grid
    nb = PP3.nbricks(g)            # 8 bricks on 16^3
    nblocks, out_cap, inb = 4, 16, 8
    rng = np.random.default_rng(3)
    homes = np.asarray([0, 0, 1, 2], np.int32)
    spid = np.zeros(nblocks, np.int32)
    usable = np.ones(nblocks, bool)
    free = jnp.asarray([5, 3, 0, 7], jnp.int32)
    # craft outbox rows: valid rows with voxels in bricks 0..2
    obx = np.zeros((9, nblocks * out_cap), np.float32)
    dest_brick = rng.integers(0, 3, nblocks * out_cap)
    B = PP3.chart_dims(g)[0]
    for r in range(nblocks * out_cap):
        b = dest_brick[r]
        bx, by, bz = b % 2, (b // 2) % 2, b // 4
        vox = (bx * B[0] + 1) + g.NX * ((by * B[1] + 1)
                                        + g.NY * (bz * B[2] + 1))
        obx[3, r] = vox
        obx[0, r] = rng.normal()
    valid = rng.random(nblocks * out_cap) < 0.2
    obx[8] = valid
    obx[3, ~valid] = 0.0
    compact, starts, a_j, ovf, _stats = RES.plan_exchange(
        jnp.asarray(obx), jnp.asarray(homes), spid, usable, free, g,
        inb=inb)
    a_j = np.asarray(a_j)
    starts = np.asarray(starts)
    compact = np.asarray(compact)
    c = np.bincount(dest_brick[valid], minlength=nb)
    # brick 0 has blocks 0,1 with cap min(free,inb) = 5,3
    assert a_j[0] == min(5, c[0]) and a_j[1] == min(3, max(c[0] - 5, 0))
    assert a_j[2] == 0                        # free == 0
    assert a_j[3] == min(7, c[2])
    assert bool(ovf) == ((c[0] > 8) or (c[1] > 0) or (c[2] > 7))
    # routed compact rows land in their destination brick
    for j in range(nblocks):
        if a_j[j]:
            voxs = compact[3, starts[j]:starts[j] + a_j[j]].astype(int)
            br = np.asarray(PP3.brick_of(jnp.asarray(voxs), g))
            assert (br == homes[j]).all()


def test_merge_p_compacts_and_inserts():
    """merge_p drops emitted lanes, compacts keepers in order, appends
    the block's compact-window newcomers -- bit-exactly."""
    import vpic_tpu.state as st_mod
    N = 2048
    rng = np.random.default_rng(0)
    f = lambda: jnp.asarray(rng.normal(size=N).astype(np.float32))
    live = rng.random(N) < 0.7
    # live lanes packed at block fronts (the layout contract)
    live = np.sort(~live.reshape(-1, 1024), axis=1).reshape(-1) == False
    emit = (rng.random(N) < 0.1) & live
    sp = st_mod.SpeciesState(
        dx=f(), dy=f(), dz=f(), i=jnp.asarray(
            rng.integers(1, 4000, N).astype(np.int32)),
        ux=f(), uy=f(), uz=f(), w=jnp.abs(f()) + 0.5,
        live=jnp.asarray(live), np=int(live.sum()))
    nblocks = N // 1024
    # compact routed rows: block j takes [starts[j], starts[j]+a[j])
    M = 512
    compact = np.zeros((8, M + 128), np.float32)
    n_routed = 200
    compact[0, :n_routed] = rng.normal(size=n_routed)
    compact[3, :n_routed] = rng.integers(1, 4000, n_routed)
    compact[7, :n_routed] = 1.0
    starts = np.asarray([3, 150], np.int32)     # unaligned on purpose
    a = np.asarray([5, 6], np.int32)
    [out] = RES.merge_p([sp], [jnp.asarray(emit.astype(np.float32))],
                        jnp.asarray(compact), jnp.asarray(starts),
                        jnp.asarray(a))
    out_live = np.asarray(out.live)
    for j in range(nblocks):
        sl = slice(j * 1024, (j + 1) * 1024)
        keepers = np.nonzero(live[sl] & ~emit[sl])[0]
        k = int(a[j])
        assert out_live[sl].sum() == len(keepers) + k
        # keepers first, in original order, bit-exact
        np.testing.assert_array_equal(
            np.asarray(out.dx)[sl][:len(keepers)],
            np.asarray(sp.dx)[sl][keepers])
        np.testing.assert_array_equal(
            np.asarray(out.i)[sl][:len(keepers)],
            np.asarray(sp.i)[sl][keepers])
        # newcomers follow, from the block's compact window
        np.testing.assert_array_equal(
            np.asarray(out.dx)[sl][len(keepers):len(keepers) + k],
            compact[0, starts[j]:starts[j] + k])
        np.testing.assert_array_equal(
            np.asarray(out.i)[sl][len(keepers):len(keepers) + k],
            compact[3, starts[j]:starts[j] + k].astype(np.int32))


@pytest.mark.slow
def test_residency_collisional_deck():
    """Built-in collision ops with a static interval >= 2 are allowed on
    the residency path: the layout is invalidated (rebucket pre-push) on
    exactly the collision steps.  Particle count is conserved and the
    energies stay within the collision-stream decorrelation envelope of
    the general path (lane order differs between paths, so the per-cell
    shuffles draw different pairings -- same as chart-vs-general)."""
    from vpic_tpu.models import reconnection
    outs = []
    for pallas in (False, True):
        p = reconnection.ReconnectionParams(
            nx=16, ny=16, nz=16, nppc=16, Lx=16., Ly=16., Lz=16.,
            tau_coll_interval=2)
        sim = reconnection.build(p)
        sim.use_pallas = pallas
        if pallas:
            assert sim._residency_mode()[0]
        st = sim.initialize()
        adv = jax.jit(sim.make_advance())
        e0 = np.asarray(sim.energies(st)).sum()
        for _ in range(5):
            st = adv(st)
        outs.append((np.asarray(sim.energies(st)),
                     sum(int(np.asarray(s.live).sum())
                         for s in st.species), e0))
    (e_g, n_g, e0_g), (e_r, n_r, e0_r) = outs
    assert n_g == n_r
    # both paths conserve their own total energy tightly
    assert abs(e_r.sum() - e0_r) / e0_r < 1e-2
    # and agree to the collision-decorrelation envelope
    assert np.abs(e_g - e_r).max() / np.abs(e_g).max() < 1e-2


def test_residency_interval1_collisions_refused():
    from vpic_tpu.models import reconnection
    p = reconnection.ReconnectionParams(
        nx=16, ny=16, nz=16, nppc=16, Lx=16., Ly=16., Lz=16.,
        tau_coll_interval=1)
    sim = reconnection.build(p)
    sim.use_pallas = True
    assert not sim._residency_mode()[0]
