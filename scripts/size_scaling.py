#!/usr/bin/env python
"""Throughput vs problem size for the harris deck (dev tool).

Usage: size_scaling.py [--chart]   (--chart forces the 2-D brick-chart
kernel; default is the auto policy)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from vpic_tpu.models import harris

CHART = "--chart" in sys.argv[1:]


def measure(nx, ny, nppc, n_steps=50):
    p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
    sim = harris.build(p)
    if CHART:
        sim.pallas_chart2d = True
    state = sim.initialize()
    adv = sim.make_multi_step(n_steps)
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    n_particles = sum(int(s.np) for s in state.species)
    t0 = time.time()
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    el = time.time() - t0
    print(f"nx={nx} ny={ny} nppc={nppc}  np={n_particles}  "
          f"step={el/n_steps*1e3:7.2f} ms  "
          f"{n_particles*n_steps/el/1e6:8.1f} Mpush/s", flush=True)


if __name__ == "__main__":
    for nx, ny, nppc in ((64, 64, 64), (64, 64, 256), (128, 128, 64),
                         (128, 128, 256), (256, 256, 64)):
        try:
            measure(nx, ny, nppc)
        except Exception as e:
            print(f"nx={nx} ny={ny} nppc={nppc}  FAILED: {type(e).__name__}: {e}",
                  flush=True)
