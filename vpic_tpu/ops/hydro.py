"""Hydro (fluid-moment) accumulation: accumulate_hydro_p
(src/species_advance/standard/hydro_p.c:27-166) vectorized.

Per particle: half E kick + half Boris rotate to time-center the momentum,
then trilinear node-centered deposit of the 14 moments
  [jx jy jz rho  px py pz ke  txx tyy tzz tyz tzx txy]
into a (nv, 14) array (hydro_t analogue, sf_interface.h:168-198).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grid import Grid
from ..state import SpeciesState
from .fields import _combine_shared, _sync_axes, get_plane, set_plane
from .push import _boris_rotate, _interp_fields, _node_offsets, \
    _trilinear_weights

N_HYDRO = 14
HYDRO_NAMES = ("jx", "jy", "jz", "rho", "px", "py", "pz", "ke",
               "txx", "tyy", "tzz", "tyz", "tzx", "txy")


def accumulate_hydro_p(hydro, sp: SpeciesState, fcoef, g: Grid, qsp, msp):
    """Add one species' moments into hydro (nv, 14)."""
    c = g.cvac
    mspc = msp * c
    qdt_2mc = (qsp * g.dt) / (2.0 * mspc)
    qdt_4mc2 = qdt_2mc / (2.0 * c)

    rows = fcoef[sp.i]
    hax, hay, haz, cbx, cby, cbz = _interp_fields(rows, sp.dx, sp.dy, sp.dz,
                                                  qdt_2mc)
    ux = sp.ux + hax
    uy = sp.uy + hay
    uz = sp.uz + haz
    usq = ux * ux + uy * uy + uz * uz
    gam = jnp.sqrt(1.0 + usq)
    ke_mc = usq * c / (gam + 1.0)          # c (gamma - 1), robust form
    vz_fac = c / gam
    # half Boris rotate; the reference's angle scalar is qdt_4mc2 * c/gamma,
    # which _boris_rotate produces from arg * rsqrt(1 + u^2) with arg below
    ux, uy, uz = _boris_rotate(ux, uy, uz, cbx, cby, cbz, qdt_4mc2 * c)
    vx, vy, vzv = ux * vz_fac, uy * vz_fac, uz * vz_fac

    w = jnp.where(sp.alive, sp.w, 0.0)
    weights = _trilinear_weights(sp.dx, sp.dy, sp.dz, g.r8V * w)  # (N, 8)

    t_q = qsp
    px_, py_, pz_ = mspc * ux, mspc * uy, mspc * uz
    mom = jnp.stack([t_q * vx, t_q * vy, t_q * vzv,
                     jnp.full_like(vx, t_q),
                     px_, py_, pz_, mspc * ke_mc,
                     px_ * vx, py_ * vy, pz_ * vzv,
                     py_ * vzv, pz_ * vx, px_ * vy], axis=-1)  # (N, 14)

    nodes = sp.i[:, None] + _node_offsets(g)[None, :]          # (N, 8)
    vals = weights[:, :, None] * mom[:, None, :]               # (N, 8, 14)
    return hydro.at[nodes.reshape(-1)].add(
        vals.reshape(-1, N_HYDRO), mode="drop")


def synchronize_hydro(hydro, g: Grid):
    """synchronize_hydro_array (hydro_array.c): sum node moments on shared
    faces (periodic wrap / cross-shard) so diagnostics see total values."""
    h = hydro.reshape(g.NZ, g.NY, g.NX, N_HYDRO)
    for axis, cross in _sync_axes(g):
        h, _ = _combine_shared(h, axis, g, cross, "sum")
    return h.reshape(g.nv, N_HYDRO)
