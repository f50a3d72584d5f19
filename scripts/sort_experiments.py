#!/usr/bin/env python
"""Break bucket_sort_p into dest-computation vs data-movement on the TPU,
and try alternative formulations (dev tool)."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import functools
import jax
import jax.numpy as jnp

from vpic_tpu.models import harris
from vpic_tpu.ops import pallas_push as PP


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def dest_mxu(b, nb, N):
    C = 256
    Np = (N + C - 1) // C * C
    bp = jnp.pad(b, (0, Np - N), constant_values=nb)
    bc = bp.reshape(-1, C)
    oh = (bc[:, :, None] == jnp.arange(nb + 1)[None, None, :]
          ).astype(jnp.bfloat16)
    tril = jnp.tril(jnp.ones((C, C), jnp.bfloat16))
    cum = jnp.einsum('ij,cjb->cib', tril, oh,
                     preferred_element_type=jnp.float32)
    chunk_tot = cum[:, -1, :]
    chunk_base = jnp.cumsum(chunk_tot, axis=0) - chunk_tot
    counts = chunk_tot.sum(axis=0)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                               jnp.cumsum(counts)[:-1]])
    ohf = oh.astype(jnp.float32)
    rank = jnp.sum(cum * ohf, axis=2) - 1.0
    base = jnp.sum(chunk_base[:, None, :] * ohf, axis=2)
    off = jnp.sum(offsets[None, None, :] * ohf, axis=2)
    return (off + base + rank).reshape(-1)[:N].astype(jnp.int32)


def main():
    p = harris.HarrisParams(nx=64, ny=64, nppc=256)
    sim = harris.build(p)
    state = sim.initialize()
    g = sim.grid
    sp = state.species[0]
    N = sp.capacity
    nb = (g.nv + PP.BUCKET - 1) // PP.BUCKET
    print(f"N={N} nv={g.nv} nb={nb}")

    b = jnp.where(sp.live, sp.i // PP.BUCKET, nb)

    t, dest = timeit(jax.jit(functools.partial(dest_mxu, nb=nb, N=N)), b)
    print(f"dest (MXU rank, nb={nb})   {t:8.3f} ms")

    # radix digits
    R = 16
    nhi = (nb + 1 + R - 1) // R
    t, _ = timeit(jax.jit(functools.partial(dest_mxu, nb=R - 1, N=N)),
                  b % R)
    print(f"dest digit lo (R={R})      {t:8.3f} ms")
    t, _ = timeit(jax.jit(functools.partial(dest_mxu, nb=nhi, N=N)),
                  b // R)
    print(f"dest digit hi (nhi={nhi})   {t:8.3f} ms")

    # data movement variants
    i_bits = jax.lax.bitcast_convert_type(sp.i, jnp.float32)
    packed = jnp.stack([sp.dx, sp.dy, sp.dz, sp.ux, sp.uy, sp.uz, sp.w,
                        i_bits, sp.live.astype(jnp.float32)], axis=1)

    t, _ = timeit(jax.jit(lambda p_, d: jnp.zeros_like(p_).at[d].set(p_)),
                  packed, dest)
    print(f"row scatter (N,9)          {t:8.3f} ms")

    packed16 = jnp.pad(packed, ((0, 0), (0, 7)))
    t, _ = timeit(jax.jit(lambda p_, d: jnp.zeros_like(p_).at[d].set(p_)),
                  packed16, dest)
    print(f"row scatter (N,16)         {t:8.3f} ms")

    src = jnp.zeros((N,), jnp.int32).at[dest].set(jnp.arange(N))
    t, _ = timeit(jax.jit(lambda p_, s: jnp.take(p_, s, axis=0)),
                  packed16, src)
    print(f"row gather (N,16)          {t:8.3f} ms")

    t, _ = timeit(jax.jit(lambda x, d: jnp.zeros_like(x).at[d].set(x)),
                  b, dest)
    print(f"1-col scatter (N,)         {t:8.3f} ms")

    # packed wide: move as (N/128, 128*16)? reshape keeps row-major so a
    # row permutation is NOT a block permutation; skip.

    # scatter via one-hot matmul per 128-wide dest tile is O(N^2/128) flops:
    # infeasible; skip.


if __name__ == "__main__":
    main()
