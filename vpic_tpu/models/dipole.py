"""Radiating-dipole deck (sample/dipole analogue): an oscillating current
element at the box center drives outgoing EM radiation into absorbing
(Higdon first-order) field boundaries.  The regression oracles are outgoing
Poynting flux through a surface enclosing the source and bounded field
energy (the absorbers eat what the dipole radiates).

The current drive uses the user_current_injection hook (the reference's
begin_current_injection deck section).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp

from ..deck import Simulation
from ..grid import ABSORB_FIELDS, ABSORB_PARTICLES, BOUNDARY


@dataclass
class DipoleParams:
    seed: int = 0
    n: int = 32               # cells per axis (cubical box)
    L: float = 16.0
    omega: float = 2.0        # drive angular frequency
    j0: float = 1.0           # peak current density
    ramp_periods: float = 1.0
    cfl_req: float = 0.98
    topology: tuple = (1, 1, 1)


def build(p: DipoleParams = DipoleParams()) -> Simulation:
    sim = Simulation(seed=p.seed)
    c, eps0 = 1.0, 1.0
    sim.define_units(c, eps0)
    dt = p.cfl_req * sim.courant_length(p.L, p.L, p.L, p.n, p.n, p.n) / c
    sim.define_timestep(dt)
    sim.define_absorbing_grid((0, 0, 0), (p.L, p.L, p.L), (p.n, p.n, p.n),
                              p.topology, pbc=ABSORB_PARTICLES)
    sim.define_material("vacuum", 1.0)
    sim.define_field_array(damp=0.0)

    # z-directed dipole: drive jfz in the center cell every step.
    cx = p.n // 2 + 1
    ramp_steps = max(int(p.ramp_periods * 2 * math.pi / (p.omega * dt)), 1)

    def current_injection(f, step):
        t = step.astype(jnp.float32) * dt
        ramp = jnp.minimum(step.astype(jnp.float32) / ramp_steps, 1.0)
        drive = p.j0 * ramp * jnp.sin(p.omega * t)
        return f.replace(jfz=f.jfz.at[cx, cx, cx].add(drive))

    sim.user_current_injection = current_injection
    sim.meta = dict(dt=dt, omega=p.omega, center=cx)
    return sim
