"""Custom particle boundary conditions (src/boundary/).

Each factory returns a handler with the boundary_p custom-BC protocol:
  handler(key, sp, pend, disp, acc, rhob, g, spp, face)
    -> (sp, pend, disp, acc, rhob)
consuming lanes parked with pend == CUSTOM_BASE + face and continuing their
remaining trajectory through the streak walk (the reference re-injects
through move_p, boundary_p.cc:440-494).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from .grid import FACE_AXIS, FACE_SIDE, Grid
from .ops.push import CUSTOM_BASE, DONE, deposit_rhob, streak_walk

SQRT2 = math.sqrt(2.0)


def _continue_walk(sp, pend, disp, acc, rhob, g, qsp, active, max_streak=4):
    zi, r = jnp.divmod(sp.i, g.sz)
    yi, xi = jnp.divmod(r, g.sy)
    (pos, disp, coords, u, alive, pend, acc, rhob) = streak_walk(
        g, qsp, sp.w, (sp.dx, sp.dy, sp.dz), disp, (xi, yi, zi),
        (sp.ux, sp.uy, sp.uz), active & sp.live, sp.live, pend, acc, rhob,
        max_streak)
    vox = coords[0] + g.NX * (coords[1] + g.NY * coords[2])
    sp = sp.replace(dx=pos[0], dy=pos[1], dz=pos[2], i=vox,
                    ux=u[0], uy=u[1], uz=u[2],
                    w=jnp.where(alive, sp.w, 0.0), live=alive,
                    np=jnp.sum(alive.astype(jnp.int32)))
    return sp, pend, disp, acc, rhob


def maxwellian_reflux(ut_para: Dict[str, float], ut_perp: Dict[str, float]):
    """maxwellian_reflux (maxwellian_reflux.c:40-241): absorbed particles
    are re-emitted with flux-weighted parallel momentum
    (u_par = sqrt(2) ut sqrt(-log U), the half-Maxwellian flux CDF inverse)
    and bi-Maxwellian perpendicular momentum; remaining displacement is
    rescaled to preserve the particle's fractional age."""

    def handler(key, sp, pend, disp, acc, rhob, g: Grid, spp, face):
        mask = pend == CUSTOM_BASE + face
        axis = FACE_AXIS[face]
        side = FACE_SIDE[face]
        utp = float(ut_para[spp.name])
        utq = float(ut_perp[spp.name])
        k1, k2, k3 = jax.random.split(key, 3)
        N = sp.capacity

        # flux-weighted parallel (into the domain) + thermal perpendicular
        e = -jnp.log(jnp.maximum(jax.random.uniform(k1, (N,)), 1e-37))
        u_par = utp * SQRT2 * jnp.sqrt(e) * (1.0 if side < 0 else -1.0)
        u_p1 = utq * jax.random.normal(k2, (N,))
        u_p2 = utq * jax.random.normal(k3, (N,))
        # map (par, perp1, perp2) onto (x, y, z) with par on the face axis
        us = [None, None, None]
        us[axis] = u_par
        us[(axis + 1) % 3] = u_p1
        us[(axis + 2) % 3] = u_p2

        # rescale the remaining displacement to keep the fractional age
        # (maxwellian_reflux.c:127-155)
        dpx, dpy, dpz = disp
        ddx, ddy, ddz = g.dx * dpx, g.dy * dpy, g.dz * dpz
        u2_old = sp.ux ** 2 + sp.uy ** 2 + sp.uz ** 2
        u2_new = us[0] ** 2 + us[1] ** 2 + us[2] ** 2
        ratio = jnp.sqrt(((1.0 + u2_old)
                          * (ddx * ddx + ddy * ddy + ddz * ddz))
                         / ((1.0 + u2_new)
                            * jnp.maximum(u2_old, 1e-37)))
        ndx = us[0] * ratio * g.rdx
        ndy = us[1] * ratio * g.rdy
        ndz = us[2] * ratio * g.rdz

        sel = lambda new, old: jnp.where(mask, new, old)
        sp = sp.replace(ux=sel(us[0], sp.ux), uy=sel(us[1], sp.uy),
                        uz=sel(us[2], sp.uz))
        disp = (sel(ndx, dpx), sel(ndy, dpy), sel(ndz, dpz))
        pend = jnp.where(mask, DONE, pend)
        return _continue_walk(sp, pend, disp, acc, rhob, g, spp.q, mask)

    return handler


def absorb_tally():
    """absorb_tally (absorb_tally.c:12-84): absorb the particle, accumulate
    its charge into rhob (corrected trilinear) and count it.  The per-species
    tally is returned through the handler's closure list for diagnostics."""
    tallies = []

    def handler(key, sp, pend, disp, acc, rhob, g: Grid, spp, face):
        mask = (pend == CUSTOM_BASE + face) & sp.live
        rhob = deposit_rhob(rhob, g, sp.i, sp.dx, sp.dy, sp.dz, sp.w,
                            spp.q, mask)
        live = sp.live & ~mask
        sp = sp.replace(live=live, w=jnp.where(live, sp.w, 0.0),
                        np=jnp.sum(live.astype(jnp.int32)))
        pend = jnp.where(mask, DONE, pend)
        tallies.append(jnp.sum(mask.astype(jnp.int32)))
        return sp, pend, disp, acc, rhob

    handler.tallies = tallies
    return handler


def link_boundary(prefix: str = "link"):
    """link_boundary (src/boundary/link.c:18-74): absorbing BC that logs
    absorbed-particle records.  Device side it behaves like absorb_tally;
    the absorbed records (position, momentum, weight) of each application
    are appended to the handler's ``records`` list for the host to dump via
    ``write_links`` (the jit boundary cannot do file I/O itself)."""
    records = []

    def handler(key, sp, pend, disp, acc, rhob, g: Grid, spp, face):
        mask = (pend == CUSTOM_BASE + face) & sp.live
        rhob = deposit_rhob(rhob, g, sp.i, sp.dx, sp.dy, sp.dz, sp.w,
                            spp.q, mask)
        records.append((spp.name, face, mask, sp.i, sp.dx, sp.dy, sp.dz,
                        sp.ux, sp.uy, sp.uz, sp.w))
        live = sp.live & ~mask
        sp = sp.replace(live=live, w=jnp.where(live, sp.w, 0.0),
                        np=jnp.sum(live.astype(jnp.int32)))
        pend = jnp.where(mask, DONE, pend)
        return sp, pend, disp, acc, rhob

    def write_links(rank: int = 0):
        import numpy as np
        with open(f"{prefix}.{rank}", "a") as fh:
            for name, face, mask, i, dx, dy, dz, ux, uy, uz, w in records:
                m = np.asarray(mask)
                for vals in zip(np.asarray(i)[m], np.asarray(dx)[m],
                                np.asarray(dy)[m], np.asarray(dz)[m],
                                np.asarray(ux)[m], np.asarray(uy)[m],
                                np.asarray(uz)[m], np.asarray(w)[m]):
                    fh.write(f"{name} {face} " +
                             " ".join(str(v) for v in vals) + "\n")
        records.clear()

    handler.write_links = write_links
    handler.records = records
    return handler
