#!/usr/bin/env python
"""Benchmark harness: particle pushes/s/chip on the 2D harris deck
(analogue of sample/bench/advance_p, which prints Mparticle-pushes/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star of 1e9
pushes/s/chip.

``--deck harris3d [nx nz nppc]`` benches the 3-D residency path instead
(default tier 32^3 x 128 = 4.2M particles); scripts/bench3d.py wraps it
to emit BENCH3D json artifacts.
"""

import json
import sys
import time


def run_deck(deck: str, args):
    import jax

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    import numpy as np

    from vpic_tpu.models import harris

    if deck == "harris3d":
        nx, nz, nppc = ((int(a) for a in args[:3]) if len(args) >= 3
                        else (32, 32, 128))
        p = harris.HarrisParams(nx=nx, ny=nx, nz=nz, nppc=nppc,
                                Lx=16.0, Ly=16.0, Lz=16.0)
        n_steps = 100
        metric = f"particle_pushes_per_second_per_chip_harris3d_{nx}x{nx}x{nz}x{nppc}"
    else:
        p = harris.HarrisParams(nx=64, ny=64, nppc=64)
        n_steps = 200
        metric = "particle_pushes_per_second_per_chip_harris2d"
    sim = harris.build(p)
    state = sim.initialize()
    # production stepping: the whole measured segment is ONE dispatch
    # (lax.scan over the advance), as Simulation.run does between
    # diagnostics.  The tunneled v5e costs ~28 ms per jitted dispatch;
    # n_steps/dispatch amortizes that to <5% of the step time.
    adv = sim.make_multi_step(n_steps)

    # compile + warm up
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    n_particles = sum(int(s.np) for s in state.species)
    e0 = np.asarray(sim.energies(state), np.float64)

    t0 = time.time()
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    elapsed = time.time() - t0

    pushes_per_s = n_particles * n_steps / elapsed

    # sanity: energy must stay conserved or the number is meaningless.
    # Healthy drift is ~1e-5 per 50 steps on this deck; window-drop /
    # lost-particle bugs show up at the 1e-3 level (README perf notes),
    # so a 1e-3 bound over the measured steps separates the two.
    e1 = np.asarray(sim.energies(state), np.float64)
    assert np.isfinite(e1).all(), "non-finite energies: benchmark invalid"
    drift = abs(e1.sum() - e0.sum()) / e0.sum()
    assert drift < 1e-3, \
        f"energy drift {drift:.2e} over {n_steps} steps: benchmark invalid"

    return {
        "metric": metric,
        "value": pushes_per_s,
        "unit": "pushes/s",
        "vs_baseline": pushes_per_s / 1.0e9,
    }


def main():
    args = sys.argv[1:]
    deck = "harris2d"
    if "--deck" in args:
        k = args.index("--deck")
        deck = args[k + 1]
        args = args[k + 2:]
    print(json.dumps(run_deck(deck, args)))


if __name__ == "__main__":
    main()
