#!/usr/bin/env python
"""Re-sweep sort interval (and the window pick_window derives from it) on
the bench deck with the adaptive min-anchored windows.  The round-2
flatness result predates per-step w0 re-derivation, which halved the
drift margin the window must carry -- the optimum may have moved.

Usage: sweep_sortk.py [nx ny nppc [K ...]]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np


def main():
    a = sys.argv[1:]
    nx, ny, nppc = (int(x) for x in a[:3]) if len(a) >= 3 else (64, 64, 64)
    Ks = [int(x) for x in a[3:]] or [4, 6, 8, 12]
    n_steps = 200

    from vpic_tpu.models import harris
    from vpic_tpu.ops import pallas_push as PP

    for K in Ks:
        p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
        sim = harris.build(p)
        sim.pallas_sort_interval = K
        g = sim.grid
        w = PP.pick_window(g, K)
        state = sim.initialize()
        adv = sim.make_multi_step(n_steps)
        state = adv(state)
        jax.block_until_ready(state.fields.ex)
        n_particles = sum(int(s.np) for s in state.species)
        t0 = time.time()
        state = adv(state)
        jax.block_until_ready(state.fields.ex)
        dt = time.time() - t0
        e = np.asarray(sim.energies(state))
        print(f"K={K:3d} window={w:5d} H={w // 128:3d} "
              f"{n_particles * n_steps / dt / 1e6:7.1f} Mpush/s "
              f"(finite={np.isfinite(e).all()})", flush=True)


if __name__ == "__main__":
    main()
