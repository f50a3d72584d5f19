#!/usr/bin/env python
"""Ablation timing of the fused push kernel under single-dispatch lax.scan
(the only trustworthy measurement over the tunneled TPU).

Ablate bits (see _kernel): 1=skip deposit, 2=skip walk, 4=skip gather,
8=skip entry one-hots, 16=skip Boris.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from vpic_tpu.models import harris
from vpic_tpu.ops import interp as I
from vpic_tpu.ops import pallas_push as PP


def main():
    a = sys.argv[1:]
    nx, ny, nppc = (int(x) for x in a[:3]) if len(a) >= 3 else (64, 64, 64)
    n = 50
    p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
    sim = harris.build(p)
    state = sim.initialize()
    g = sim.grid
    spp = sim.species[0].params
    nvp = PP.table_width(g)
    fcoef_T = jax.jit(lambda f: I.load_interpolator_T(f, g, nvp))(
        state.fields)
    sp_s = jax.jit(lambda s: PP.bucket_sort_p(
        PP.remap_ghost_voxels(s, g), g))(state.species[0])
    acc_T0 = jnp.zeros((16, nvp), jnp.float32)
    N = sp_s.capacity

    def bench(ablate, tag):
        def body(c, _):
            sp, acc = c
            sp2, acc2, oflag, oow = PP.fused_push(
                sp, fcoef_T, acc, g, spp.q, spp.m, ablate=ablate)
            return (sp2, acc2), None

        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])
        out = f((sp_s, acc_T0))
        jax.block_until_ready(out[1])
        t0 = time.perf_counter()
        out = f((sp_s, acc_T0))
        jax.block_until_ready(out[1])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{tag:44s} {ms:8.3f} ms/iter  "
              f"{N / ms / 1e3:8.1f} Mrow/s", flush=True)
        return ms

    full = bench(0, "full kernel")
    bench(32, "XLA prep only (no pallas_call)")
    bench(1, "no deposit matmuls")
    bench(2, "no walk rounds (gather+boris only)")
    bench(3, "no walk, no deposit")
    bench(4 | 16, "no gather, no boris")
    bench(8 | 4 | 16 | 2 | 1, "empty kernel (DMA + guards only)")


if __name__ == "__main__":
    main()
