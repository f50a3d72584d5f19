#!/usr/bin/env python
"""Throughput of the 3-D residency path vs the per-step-sort chart path
on pure harris3d tiers (dev tool).

Usage: residency_scaling3d.py [--sort] [--xla] [tiers...]
  --sort forces the per-step brick sort (residency off)
  --xla  forces the general XLA path
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from vpic_tpu.models import harris

MODE = ("sort" if "--sort" in sys.argv[1:]
        else "xla" if "--xla" in sys.argv[1:] else "res")


def measure(nx, ny, nz, nppc, n_steps=50):
    p = harris.HarrisParams(nx=nx, ny=ny, nz=nz, nppc=nppc,
                            Lx=16.0, Ly=16.0, Lz=16.0)
    sim = harris.build(p)
    if MODE == "xla":
        sim.use_pallas = False
    elif MODE == "sort":
        sim.pallas_residency = False
    else:
        assert sim._residency_mode()[0], "residency refused"
    state = sim.initialize()
    adv = sim.make_multi_step(n_steps)
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    n_particles = sum(int(s.np) for s in state.species)
    t0 = time.time()
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    el = time.time() - t0
    print(f"[{MODE}] nx={nx} nz={nz} nppc={nppc}  np={n_particles}  "
          f"step={el/n_steps*1e3:7.2f} ms  "
          f"{n_particles*n_steps/el/1e6:8.1f} Mpush/s", flush=True)


if __name__ == "__main__":
    for nx, ny, nz, nppc in ((32, 32, 32, 32), (32, 32, 32, 128),
                             (64, 64, 64, 16)):
        try:
            measure(nx, ny, nz, nppc)
        except Exception as e:
            print(f"{nx}^3 nppc={nppc}  FAILED: {type(e).__name__}: {e}",
                  flush=True)
