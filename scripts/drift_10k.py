#!/usr/bin/env python
"""10k-step harris energy-drift measurement (BASELINE.md axis: total
energy conserved to ~1e-6-level over 10k steps).  Runs on the TPU in
scan chunks; prints the relative total-energy drift every 1000 steps.

Usage: drift_10k.py [nx ny nppc [nsteps]]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from vpic_tpu.models import harris


def main():
    a = sys.argv[1:]
    nx, ny, nppc = (int(x) for x in a[:3]) if len(a) >= 3 else (64, 64, 64)
    nsteps = int(a[3]) if len(a) > 3 else 10000
    chunk = 500
    p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
    sim = harris.build(p)
    state = sim.initialize()
    adv = sim.make_multi_step(chunk)
    e0 = float(np.asarray(sim.energies(state)).sum())
    t0 = time.time()
    done = 0
    while done < nsteps:
        state = adv(state)
        done += chunk
        if done % 1000 == 0:
            e = float(np.asarray(sim.energies(state)).sum())
            print(f"step {done:6d}  drift {(e - e0) / e0:+.3e}  "
                  f"({(time.time() - t0):.0f}s)", flush=True)
    e = float(np.asarray(sim.energies(state)).sum())
    print(f"FINAL: {nsteps} steps, relative total-energy drift "
          f"{(e - e0) / e0:+.3e}")


if __name__ == "__main__":
    main()
