#!/usr/bin/env python
"""Phase-level timing of the harris fused-path step on the real TPU.

Times each phase as its own jitted dispatch (so numbers include the ~25us
dispatch overhead each, but expose relative cost). Not part of the test
suite; a development tool.
"""

import time
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from vpic_tpu.models import harris
from vpic_tpu import ops
from vpic_tpu.ops import pallas_push as PP
from vpic_tpu.ops import fields as F
from vpic_tpu.ops import interp as I
from vpic_tpu.ops import push as P


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    a = sys.argv[1:]
    nx, ny, nppc = (int(x) for x in a) if len(a) == 3 else (64, 64, 64)
    p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
    sim = harris.build(p)
    state = sim.initialize()
    g = sim.grid
    m = sim._material_coeffs()
    spp = sim.species[0].params
    f = state.fields
    sp = state.species[0]

    nvp = PP.table_width(g)
    print(f"grid nv={g.nv} nvp={nvp} capacity={sp.capacity}")

    load_T = jax.jit(lambda f: I.load_interpolator_T(f, g, nvp))
    t, fcoef_T = timeit(load_T, f)
    print(f"load_interpolator_T      {t:8.3f} ms")

    remap = jax.jit(lambda s: PP.remap_ghost_voxels(s, g))
    t, sp_r = timeit(remap, sp)
    print(f"remap_ghost_voxels       {t:8.3f} ms")

    bsort = jax.jit(lambda s: PP.bucket_sort_p(s, g))
    t, sp_s = timeit(bsort, sp_r)
    print(f"bucket_sort_p            {t:8.3f} ms")

    acc_T0 = jnp.zeros((16, nvp), jnp.float32)
    push = jax.jit(lambda s, fc, a: PP.fused_push(s, fc, a, g, spp.q, spp.m))
    t, (sp2, acc_T, oflag, oow) = timeit(push, sp_s, fcoef_T, acc_T0)
    nfl = int(jnp.sum(oflag > 0))
    print(f"fused_push               {t:8.3f} ms   (outliers={nfl}, oow={int(oow)})")

    acc_small0 = jnp.zeros((g.nv, 12), jnp.float32)
    rhob0 = f.rhob.reshape(-1)
    outl = jax.jit(lambda s, fl, a, r: PP.outlier_pass(
        s, fl, fcoef_T, g, spp.q, spp.m, a, r))
    t, _ = timeit(outl, sp2, oflag, acc_small0, rhob0)
    print(f"outlier_pass (forced)    {t:8.3f} ms")

    fold = jax.jit(lambda a: PP.fold_ghost_acc_T(a, g))
    t, acc_Tf = timeit(fold, acc_T)
    print(f"fold_ghost_acc_T         {t:8.3f} ms")

    unload = jax.jit(lambda f, a, ex: I.unload_accumulator_T(
        F.clear_jf(f), a, g, extra=ex))
    t, f2 = timeit(unload, f, acc_Tf, acc_small0)
    print(f"clear+unload_acc_T       {t:8.3f} ms")

    sync_jf = jax.jit(lambda f: F.synchronize_jf(f, g))
    t, f3 = timeit(sync_jf, f2)
    print(f"synchronize_jf           {t:8.3f} ms")

    adv_b = jax.jit(lambda f: F.advance_b(f, g, 0.5))
    t, _ = timeit(adv_b, f3)
    print(f"advance_b (x2/step)      {t:8.3f} ms")

    adv_e = jax.jit(lambda f: F.advance_e(f, g, m, sim.damp))
    t, _ = timeit(adv_e, f3)
    print(f"advance_e                {t:8.3f} ms")

    rho = jax.jit(lambda f, s: f.replace(rhof=P.accumulate_rho_p(
        F.clear_rhof(f).rhof.reshape(-1), s, g, spp.q).reshape(g.shape)))
    t, f4 = timeit(rho, f3, sp_r)
    print(f"accumulate_rho_p (1sp)   {t:8.3f} ms")

    div_e = jax.jit(lambda f: F.clean_div_e(F.compute_div_e_err(
        F.synchronize_rho(f, g), g, m), g, m))
    t, _ = timeit(div_e, f4)
    print(f"div_e round              {t:8.3f} ms")

    div_b = jax.jit(lambda f: F.clean_div_b(F.compute_div_b_err(f, g), g))
    t, _ = timeit(div_b, f3)
    print(f"div_b round              {t:8.3f} ms")

    sync_teb = jax.jit(lambda f: F.synchronize_tang_e_norm_b(f, g)[0])
    t, _ = timeit(sync_teb, f3)
    print(f"sync_tang_e_norm_b       {t:8.3f} ms")

    # whole step for reference
    adv = sim.make_multi_step(10)
    t, _ = timeit(adv, state, n=3)
    print(f"full step (scan/10 avg)  {t/10:8.3f} ms")


if __name__ == "__main__":
    main()
