#!/usr/bin/env python
"""Per-block voxel-span statistics on the harris bench config: how wide a
window does each 2048-particle block ACTUALLY need at each step since the
last bucket sort?  Sizes the adaptive narrow/wide kernel tiers (dev tool).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from vpic_tpu.models import harris


def main():
    a = sys.argv[1:]
    nx, ny, nppc = (int(x) for x in a[:3]) if len(a) >= 3 else (64, 64, 64)
    sortK = int(a[3]) if len(a) > 3 else 8
    p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
    sim = harris.build(p)
    sim.pallas_sort_interval = sortK
    g = sim.grid
    state = sim.initialize()
    # warm the plasma so drift statistics are realistic; end exactly at a
    # sort boundary (sorts run at the START of steps with step%sortK==0),
    # so iteration j below is "pushes since the last bucket sort"
    warm = (100 // sortK) * sortK
    state = sim.make_multi_step(warm)(state)
    jax.block_until_ready(state.fields.ex)

    one = sim.make_multi_step(1)
    GUARD = 2 * g.NX
    BLOCK = 2048

    print(f"grid {nx}x{ny} nppc={nppc} sortK={sortK} NX={g.NX} GUARD={GUARD}")
    print(f"{'j':>3} {'p50H':>6} {'p90H':>6} {'p99H':>6} {'maxH':>6} "
          f"{'fracH<=6':>9} {'fracH<=8':>9}")
    for j in range(1, sortK + 2):
        state = one(state)
        jax.block_until_ready(state.fields.ex)
        Hs = []
        for sp in state.species:
            vox = np.asarray(sp.i)
            live = np.asarray(sp.live)
            N = vox.shape[0]
            nb = N // BLOCK
            v = vox[:nb * BLOCK].reshape(nb, BLOCK).astype(np.int64)
            lv = live[:nb * BLOCK].reshape(nb, BLOCK)
            big = np.where(lv, v, 2**31)
            small = np.where(lv, v, -1)
            mn = big.min(axis=1)
            mx = small.max(axis=1)
            ok = mn <= mx
            span = (mx - mn + 2 * GUARD)[ok]
            H = np.ceil((span + 127) / 128).astype(int) + 1
            Hs.append(H)
        H = np.concatenate(Hs)
        q = np.percentile(H, [50, 90, 99])
        print(f"{j:3d} {q[0]:6.1f} {q[1]:6.1f} {q[2]:6.1f} {H.max():6d} "
              f"{(H <= 6).mean():9.3f} {(H <= 8).mean():9.3f}")


if __name__ == "__main__":
    main()
