#!/usr/bin/env python
"""Benchmark harness: particle pushes/s/chip on the 2D harris deck
(analogue of sample/bench/advance_p, which prints Mparticle-pushes/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star of 1e9
pushes/s/chip.
"""

import json
import sys
import time


def main():
    import jax

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    import numpy as np

    from vpic_tpu.models import harris

    p = harris.HarrisParams(nx=64, ny=64, nppc=64)
    sim = harris.build(p)
    state = sim.initialize()
    n_steps = 50
    # production stepping: the whole measured segment is ONE dispatch
    # (lax.scan over the advance), as Simulation.run does between diagnostics
    adv = sim.make_multi_step(n_steps)

    # compile + warm up
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    n_particles = sum(int(s.np) for s in state.species)

    t0 = time.time()
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    elapsed = time.time() - t0

    pushes_per_s = n_particles * n_steps / elapsed

    # sanity: energy must stay conserved or the number is meaningless
    e = np.asarray(sim.energies(state))
    assert np.isfinite(e).all(), "non-finite energies: benchmark invalid"

    print(json.dumps({
        "metric": "particle_pushes_per_second_per_chip_harris2d",
        "value": pushes_per_s,
        "unit": "pushes/s",
        "vs_baseline": pushes_per_s / 1.0e9,
    }))


if __name__ == "__main__":
    main()
