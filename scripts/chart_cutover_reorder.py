#!/usr/bin/env python
"""Measure the 2-D chart-vs-window cutover for LANE-REORDERING decks
(VERDICT r4 item 7): decks with collisions/emitters force a per-step sort
(sortK=1), which costs charts their sort-cycle amortization -- the round-3
policy kept windows for them on a guess.  This measures both kernels on a
collision deck (langevin: reorders via shuffle_sort like the binary models
but cheap enough that the PUSH path difference dominates) at >= 96^2 tiers.

Usage: chart_cutover_reorder.py [--pure]
(--pure: no collision op -- re-measures the plain-deck cutover table)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax


PURE = "--pure" in sys.argv


def measure(nx, ny, nppc, chart, n_steps=50):
    from vpic_tpu import collision as C
    from vpic_tpu.models import harris

    p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
    sim = harris.build(p)
    if not PURE:
        # a collision op: forces the chart path's per-step sort (sortK=1)
        # via the reorders policy, the case item 7 asks about
        sim.collision_ops.append(C.make_langevin_op(
            1, sim.species[1].params, kT=1e-4, nu=1e-3, interval=1))
    sim.use_pallas = True
    sim.pallas_chart2d = bool(chart)
    use_fused, fused2, fused3, sortK = sim._fused_mode()
    state = sim.initialize()
    adv = sim.make_multi_step(n_steps)
    state = adv(state)
    jax.block_until_ready(state.fields.ex)
    n_particles = sum(int(s.np) for s in state.species)
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        state = adv(state)
        jax.block_until_ready(state.fields.ex)
        best = min(best, time.time() - t0)
    mode = "chart" if fused3 else ("window" if fused2 else "xla")
    print(f"{nx}x{ny}x{nppc}  {mode:7s} sortK={sortK}  "
          f"{n_particles*n_steps/best/1e6:8.1f} Mpush/s", flush=True)


def main():
    tiers = [(96, 96, 64), (128, 128, 64), (128, 128, 256), (256, 256, 64)]
    for nx, ny, nppc in tiers:
        for chart in (False, True):
            try:
                measure(nx, ny, nppc, chart)
            except Exception as e:
                print(f"{nx}x{ny}x{nppc} chart={chart} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
