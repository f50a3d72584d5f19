"""Field diagnostics beyond energies: Poynting flux (src/vpic/diagnostics.cc:
24-81) and Gauss-law / div-B residual helpers used by regression decks."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .grid import Grid
from .ops import fields as F
from .state import FieldState, MaterialCoeffs

# lifted+jitted shard reducers, one per (grid, e0): per-step diagnostic
# use must not retrace/recompile on every call
_POYNTING_LIFTED = {}


def _poynting_lifted(g: Grid, e0: float):
    key = (id(g), float(e0))
    fn = _POYNTING_LIFTED.get(key)
    if fn is None:
        import jax
        from .parallel.mesh import make_mesh, shard_reduce_fn
        fn = jax.jit(shard_reduce_fn(
            lambda ff: poynting_flux(ff, g, e0), g, make_mesh(g)))
        _POYNTING_LIFTED[key] = fn
    return fn


def poynting_flux(f: FieldState, g: Grid, e0: float = 1.0):
    """Average Poynting flux through the low-x boundary plane
    (diagnostics.cc:34-81): (ey*<cbz> - ez*<cby>) / (cvac^2 e0^2) sampled
    one x-plane inside the global low-x face, summed over the reference's
    j,k in [1, n) transverse range, ONLY on ix==0 domains (RANK_TO_INDEX
    gate, diagnostics.cc:50-51), and normalized by the GLOBAL
    boundary-plane sample count (gpsum /= stride*py*pz, :75).

    Degenerate transverse axes (ny==1 or nz==1, where the reference's
    (n-1)-point range is empty and its normalization divides by zero) fall
    back to the single interior sample on that axis.

    Shard-local inside shard_map on decomposed grids; a global sharded
    FieldState (leading topology dims) is auto-lifted."""
    if g.sharded and f.ey.ndim > 3:
        return _poynting_lifted(g, e0)(f)
    ys = slice(2, g.ny + 1) if g.ny > 1 else slice(1, 2)
    zs = slice(2, g.nz + 1) if g.nz > 1 else slice(1, 2)
    ey = f.ey[zs, ys, 2]
    ez = f.ez[zs, ys, 2]
    cbz = 0.5 * (f.cbz[zs, ys, 1] + f.cbz[zs, ys, 2])
    cby = 0.5 * (f.cby[zs, ys, 1] + f.cby[zs, ys, 2])
    s = ey * cbz - ez * cby
    local = jnp.sum(s) / (g.cvac * g.cvac * e0 * e0)
    if g.sharded:
        import jax
        ix = jax.lax.axis_index(g.mesh_axes[0])
        local = jnp.where(ix == 0, local, 0.0)
    ny_eff = (g.ny - 1) if g.ny > 1 else 1
    nz_eff = (g.nz - 1) if g.nz > 1 else 1
    return F.all_sum(local, g) / (ny_eff * nz_eff
                                  * g.topology[1] * g.topology[2])


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
