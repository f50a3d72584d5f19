"""Field diagnostics beyond energies: Poynting flux (src/vpic/diagnostics.cc:
24-81) and Gauss-law / div-B residual helpers used by regression decks."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .ops import fields as F
from .state import FieldState, MaterialCoeffs


def poynting_flux(f: FieldState, g: Grid, e0: float = 1.0):
    """Average Poynting flux through the low-x boundary plane
    (diagnostics.cc:34-81): mean over the x=1 face of
    ey*<cbz> - ez*<cby> with cb averaged across the face, scaled by e0^2
    (the caller's field normalization, as in the reference)."""
    ey = f.ey[1:-1, 1:-1, 1]
    ez = f.ez[1:-1, 1:-1, 1]
    cbz = 0.5 * (f.cbz[1:-1, 1:-1, 0] + f.cbz[1:-1, 1:-1, 1])
    cby = 0.5 * (f.cby[1:-1, 1:-1, 0] + f.cby[1:-1, 1:-1, 1])
    s = ey * cbz - ez * cby
    local = jnp.sum(s) / s.size
    return F.all_sum(local, g) * (e0 * e0) / max(g.n_shards, 1)


def gauss_error(sim, state):
    """RMS Gauss-law residual of the current state (the energy_comparison
    regression's auxiliary check)."""
    from .ops import push as P
    g = sim.grid
    m = sim._material_coeffs()
    f = F.clear_rhof(state.fields)
    rhof = f.rhof.reshape(-1)
    for st, sp in zip(sim.species, state.species):
        rhof = P.accumulate_rho_p(rhof, sp, g, st.params.q)
    f = f.replace(rhof=rhof.reshape(g.shape))
    f = F.synchronize_rho(f, g)
    f = F.compute_div_e_err(f, g, m)
    num, den = F.compute_rms_div_e_err(f, g)
    return g.eps0 * jnp.sqrt(F.all_sum(num, g) / F.all_sum(den, g))


def div_b_error(f: FieldState, g: Grid):
    f = F.compute_div_b_err(f, g)
    num, den = F.compute_rms_div_b_err(f, g)
    return g.eps0 * jnp.sqrt(F.all_sum(num, g) / F.all_sum(den, g))
