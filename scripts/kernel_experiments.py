#!/usr/bin/env python
"""Quick A/B experiments on the fused push kernel (dev tool).

Monkeypatches precision / streak-round guards into ops.pallas_push._kernel
variants to find the bottleneck before committing to a design.
"""

import time
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from vpic_tpu.models import harris
from vpic_tpu.ops import pallas_push as PP
from vpic_tpu.ops import interp as I


def timeit(fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    p = harris.HarrisParams(nx=64, ny=64, nppc=64)
    sim = harris.build(p)
    state = sim.initialize()
    g = sim.grid
    spp = sim.species[0].params
    f = state.fields
    sp = state.species[0]
    nvp = PP.table_width(g)
    fcoef_T = jax.jit(lambda f: I.load_interpolator_T(f, g, nvp))(f)
    sp_s = jax.jit(lambda s: PP.bucket_sort_p(PP.remap_ghost_voxels(s, g), g))(sp)
    acc_T0 = jnp.zeros((16, nvp), jnp.float32)

    import vpic_tpu.ops.pallas_push as mod

    def run(tag):
        mod._run.clear_cache()
        push = jax.jit(lambda s, fc, a: mod.fused_push(
            s, fc, a, g, spp.q, spp.m))
        t, (sp2, acc_T, oflag, oow) = timeit(push, sp_s, fcoef_T, acc_T0)
        print(f"{tag:40s} {t:8.3f} ms  outliers={int(jnp.sum(oflag > 0))}"
              f" acc_sum={float(jnp.abs(acc_T).sum()):.6e}")
        return acc_T

    base = run("baseline HIGHEST")

    # experiment 1: precision DEFAULT everywhere (accuracy-destroying; just
    # measures the MXU share)
    import jax.lax as lax
    orig_dg = lax.dot_general

    def dg_default(*a, **kw):
        kw["precision"] = jax.lax.Precision.DEFAULT
        return orig_dg(*a, **kw)

    lax.dot_general = dg_default
    try:
        run("precision DEFAULT (1-pass bf16)")
    finally:
        lax.dot_general = orig_dg


if __name__ == "__main__":
    main()
