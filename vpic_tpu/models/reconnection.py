"""Collisional 3-D reconnection deck (sample/reconnection/open-collisional
analogue): the Harris sheet deck extended to 3-D with first-class
Takizuka-Abe intra- and inter-species Coulomb collisions (the reference
implements T&A at deck level; here it is the built-in collision op)."""

from __future__ import annotations

from dataclasses import dataclass

from .. import collision as C
from . import harris


@dataclass
class ReconnectionParams(harris.HarrisParams):
    nz: int = 8
    Lz: float = 4.0
    tau_coll_interval: int = 5      # collision op cadence (steps)
    log_lambda: float = 10.0
    coll_n0: float = 1.0            # density scale for the T&A variance


def build(p: ReconnectionParams = ReconnectionParams()) -> harris.Simulation:
    sim = harris.build(p)
    g = sim.grid
    ion, electron = sim.species[0].params, sim.species[1].params
    for (i, j, pi, pj) in ((0, 0, ion, ion), (1, 1, electron, electron),
                           (1, 0, electron, ion)):
        sim.collision_ops.append(C.make_takizuka_abe_op(
            i, j, pi, pj, g, log_lambda=p.log_lambda, n0=p.coll_n0,
            interval=p.tau_coll_interval))
    return sim
