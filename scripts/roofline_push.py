#!/usr/bin/env python
"""Push-speed upper-bound harness (perform_uncenter analogue,
test/performance/perform_uncenter/uncenter.cpp: 100 steps of uncenter_p
over ~1M particles on a tiny grid).

Measures, per dispatch-amortized lax.scan step on the live chip:
  1. uncenter_p alone           -- the reference's literal roofline
  2. gather + Boris kick        -- interpolate + momentum update, no
                                   deposit/no streak walk: the ceiling the
                                   fused push kernel is chasing
  3. HBM bandwidth bound        -- 8 f32 streams read+write at the chip's
                                   ~820 GB/s (v5e): the speed-of-light row

Usage: python scripts/roofline_push.py [npart_log2] (default 2^21)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import vpic_tpu as vt
    from vpic_tpu.ops import interp as I
    from vpic_tpu.ops import push as P

    npart = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 21)
    nsteps = 100

    sim = vt.Simulation(seed=0)
    sim.define_units(1.0, 1.0)
    n = 8
    g0 = vt.partition_periodic_box(0, 0, 0, 100.0, 100.0, 100.0, n, n, n)
    sim.define_timestep(1.0)
    sim.define_periodic_grid((0, 0, 0), (100.0, 100.0, 100.0), (n, n, n))
    sim.define_material("vacuum", 1.0)
    sim.define_field_array(damp=0.0)
    el = sim.define_species("e", 1.0, 1.0, npart)
    g = sim.grid

    rng = np.random.default_rng(0)
    sp = vt.state.SpeciesState.empty(npart)
    xs = rng.uniform(0.02, 0.98, npart).astype(np.float32) * 2 - 1
    vox = rng.integers(1, n + 1, (3, npart))
    sp = sp.replace(
        dx=jnp.asarray(xs), dy=jnp.asarray(np.roll(xs, 1)),
        dz=jnp.asarray(np.roll(xs, 2)),
        i=jnp.asarray((vox[0] + g.NX * (vox[1] + g.NY * vox[2]))
                      .astype(np.int32)),
        ux=jnp.zeros(npart), uy=jnp.zeros(npart), uz=jnp.zeros(npart),
        w=jnp.ones(npart), live=jnp.ones(npart, bool),
        np=jnp.int32(npart))

    st = sim.initialize()
    fcoef = jax.jit(lambda f: I.load_interpolator(f, g))(st.fields)
    qdt_2mc = 0.5 * g.dt / 1.0
    q, m = 1.0, 1.0

    def timed(fn, carry, label):
        run = jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: (fn(cc), None), c, None, length=nsteps)[0])
        out = run(carry)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.time()
        out = run(out)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt_ = time.time() - t0
        mps = npart * nsteps / dt_ / 1e6
        print(f"{label:<28s} {dt_*1e3/nsteps:8.3f} ms/step "
              f"{mps:10.1f} Mpush/s")
        return mps

    # 1. uncenter_p (the reference harness body, uncenter.cpp:70-90)
    timed(lambda s: P.uncenter_p(s, fcoef, g, q, m), sp, "uncenter_p")

    # 2. gather + Boris kick, no deposit (feedback through u so the scan
    #    cannot be elided)
    def kick(s):
        s2 = P.uncenter_p(P.center_p(s, fcoef, g, q, m), fcoef, g, q, m)
        return s2

    timed(kick, sp, "center+uncenter (2x kick)")

    # 3. HBM bound: stream 8 f32 arrays (the particle rows) once
    def stream(arrs):
        return tuple(a + 1.0 for a in arrs)

    arrs = tuple(jnp.zeros(npart, jnp.float32) for _ in range(8))
    run = jax.jit(lambda c: jax.lax.scan(
        lambda cc, _: (stream(cc), None), c, None, length=nsteps)[0])
    out = run(arrs)
    jax.block_until_ready(out[0])
    t0 = time.time()
    out = run(out)
    jax.block_until_ready(out[0])
    dt_ = time.time() - t0
    nbytes = npart * 4 * 8 * 2  # read + write
    print(f"{'8-stream HBM r/w':<28s} {dt_*1e3/nsteps:8.3f} ms/step "
          f"{npart*nsteps/dt_/1e6:10.1f} Mrow/s "
          f"({nbytes*nsteps/dt_/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
