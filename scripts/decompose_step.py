#!/usr/bin/env python
"""Reliable phase decomposition: each phase timed as a SINGLE jitted
lax.scan dispatch of n iterations (the only trustworthy measurement over
the tunneled TPU -- per-op timeit loops dedup/batch and lie).

Usage: decompose_step.py [nx ny nppc [niter]]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from vpic_tpu.models import harris
from vpic_tpu.ops import pallas_push as PP
from vpic_tpu.ops import fields as F
from vpic_tpu.ops import interp as I
from vpic_tpu.ops import push as P


def scan_time(fn, init, n, label, per_particle=None):
    """Time jit(scan(fn)) single-dispatch; fn: carry -> carry."""
    f = jax.jit(lambda c: jax.lax.scan(lambda c, _: (fn(c), None), c, None,
                                       length=n)[0])
    out = f(init)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = f(init)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    extra = ""
    if per_particle:
        extra = f"  {per_particle / ms / 1e3:8.1f} Mpush/s"
    print(f"{label:34s} {ms:8.3f} ms/iter{extra}", flush=True)
    return out


def main():
    a = sys.argv[1:]
    nx, ny, nppc = (int(x) for x in a[:3]) if len(a) >= 3 else (64, 64, 64)
    n = int(a[3]) if len(a) > 3 else 50
    p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
    sim = harris.build(p)
    state = sim.initialize()
    g = sim.grid
    m = sim._material_coeffs()
    spp = sim.species[0].params
    f0 = state.fields
    sp0 = state.species[0]
    npart = nx * ny * nppc
    print(f"grid {nx}x{ny} nppc={nppc}  np={npart}  capacity={sp0.capacity}")

    window = PP.pick_window(g, 4)
    nvp = PP.table_width(g, window)
    fcoef_T = I.load_interpolator_T(f0, g, nvp)

    # full step baseline
    adv = sim.make_advance()
    scan_time(adv, state, n, "FULL STEP", per_particle=npart)

    # push only (1 species, fixed table; carry = sp + acc)
    acc0 = jnp.zeros((16, nvp), jnp.float32)

    def push_only(c):
        sp, _ = c
        sp2, acc, oflag, oow = PP.fused_push(sp, fcoef_T, acc0, g, spp.q,
                                             spp.m, window=window)
        return sp2, acc

    scan_time(push_only, (sp0, acc0), n, "fused_push (1 sp)",
              per_particle=npart // 2)

    # sort only
    def sort_only(c):
        return PP.bucket_sort_p(PP.remap_ghost_voxels(c, g), g)

    scan_time(sort_only, sp0, n, "remap+bucket_sort (1 sp)")

    # outlier pass only (zero flags -> gated branch cost)
    zflag = jnp.zeros((sp0.capacity,), jnp.int32)
    acc_small0 = jnp.zeros((g.nv, 12), jnp.float32)
    rhob0 = f0.rhob.reshape(-1)

    def outl(c):
        sp, accs, rb = c
        sp, accs, rb = PP.outlier_pass(sp, zflag, fcoef_T, g, spp.q, spp.m,
                                       accs, rb, 4)
        return sp, accs, rb

    scan_time(outl, (sp0, acc_small0, rhob0), n, "outlier_pass (0 flags, 1 sp)")

    # field phase: fold + clear + unload + sync_jf + b/e/b + load_T
    acc_T = jnp.ones((16, nvp), jnp.float32)
    accs = jnp.zeros((g.nv, 12), jnp.float32)

    def field_phase(c):
        f, _ = c
        a = PP.fold_ghost_acc_T(acc_T, g)
        f = F.clear_jf(f)
        f = I.unload_accumulator_T(f, a, g, extra=accs)
        f = F.synchronize_jf(f, g)
        f = F.advance_b(f, g, 0.5)
        f = F.advance_e(f, g, m, sim.damp)
        f = F.advance_b(f, g, 0.5)
        fc = I.load_interpolator_T(f, g, nvp)
        return f, fc

    scan_time(field_phase, (f0, fcoef_T), n, "field phase (fold..load_T)")

    # clean_e body (rho deposit 2sp + sync + 2 div rounds)
    def clean_e(c):
        f = F.clear_rhof(c)
        rhof = f.rhof.reshape(-1)
        for sp in state.species:
            rhof = P.accumulate_rho_p(rhof, PP.remap_ghost_voxels(sp, g), g,
                                      spp.q)
        f = f.replace(rhof=rhof.reshape(g.shape))
        f = F.synchronize_rho(f, g)
        for _ in range(2):
            f = F.compute_div_e_err(f, g, m)
            f = F.clean_div_e(f, g, m)
        return f

    scan_time(clean_e, f0, n, "clean_e body")

    def clean_b(c):
        f = c
        for _ in range(2):
            f = F.compute_div_b_err(f, g)
            f = F.clean_div_b(f, g)
        return f

    scan_time(clean_b, f0, n, "clean_b body")

    def sync_teb(c):
        return F.synchronize_tang_e_norm_b(c, g)[0]

    scan_time(sync_teb, f0, n, "sync_tang_e_norm_b body")


if __name__ == "__main__":
    main()
