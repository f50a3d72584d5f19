"""Custom particle boundary conditions (src/boundary/).

Each factory returns a handler with the boundary_p custom-BC protocol:
  handler(key, sp, pend, disp, acc, rhob, g, spp, face, diag)
    -> (sp, pend, disp, acc, rhob, diag)
consuming lanes parked with pend == CUSTOM_BASE + face and continuing their
remaining trajectory through the streak walk (the reference re-injects
through move_p, boundary_p.cc:440-494).

``diag`` is the jit-carried diagnostics dict (SimState.diag): handlers that
count interactions (absorb_tally) expose ``diag_init(names, face)`` so
Simulation.initialize can pre-create their keys with a fixed structure, then
accumulate into those keys functionally -- counts survive lax.scan
multi-stepping and are read host-side after the fact.
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

    def handler(key, sp, pend, disp, acc, rhob, g: Grid, spp, face,
                diag=None):
        # ``face`` is the registry key: 0-5 for whole-domain faces,
        # 6 + 6*h + f for interior region surfaces (set_region_particle_bc)
        # -- key % 6 recovers the geometric exit face either way.
        mask = pend == CUSTOM_BASE + face
        axis = FACE_AXIS[face % 6]
        side = FACE_SIDE[face % 6]
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
        out = _continue_walk(sp, pend, disp, acc, rhob, g, spp.q, mask)
        return out + (diag,)

    # acts on lanes in place (never relocates/creates live slots): safe
    # under deck.make_advance's no_growth extent-sort optimization
    handler.in_place = True
    return handler


def _tally_key(name: str, face: int) -> str:
    return f"absorb_tally/{name}/f{face}"


def absorb_tally():
    """absorb_tally (absorb_tally.c:12-84): absorb the particle, accumulate
    its charge into rhob (corrected trilinear) and count it.  The per-species
    count rides ``SimState.diag`` under key ``absorb_tally/{name}/f{face}``
    (pre-created by ``handler.diag_init``); read it back host-side with
    ``tally_of(state.diag, name, face)``."""

    def handler(key, sp, pend, disp, acc, rhob, g: Grid, spp, face,
                diag=None):
        mask = (pend == CUSTOM_BASE + face) & sp.live
        rhob = deposit_rhob(rhob, g, sp.i, sp.dx, sp.dy, sp.dz, sp.w,
                            spp.q, mask)
        live = sp.live & ~mask
        sp = sp.replace(live=live, w=jnp.where(live, sp.w, 0.0),
                        np=jnp.sum(live.astype(jnp.int32)))
        pend = jnp.where(mask, DONE, pend)
        k = _tally_key(spp.name, face)
        if diag is not None and k in diag:
            diag = {**diag, k: diag[k] + jnp.sum(mask.astype(jnp.int32))}
        return sp, pend, disp, acc, rhob, diag

    def diag_init(sp_params, face):
        return {_tally_key(spp.name, face): jnp.int32(0)
                for spp in sp_params}

    handler.diag_init = diag_init
    handler.in_place = True
    return handler


def tally_of(diag, species_name: str, face: int) -> int:
    """Total absorb_tally count for (species, face); sums over shards when
    the diag leaves carry leading mesh dims."""
    import numpy as np
    return int(np.asarray(diag[_tally_key(species_name, face)]).sum())


def link_boundary(prefix: str = "link", buffer_size: int = 4096):
    """link_boundary (src/boundary/link.c:18-74): absorbing BC that logs
    absorbed-particle records.  Device side it behaves like absorb_tally;
    records land in a fixed-size ring buffer carried in ``SimState.diag``
    (keys ``link/{prefix}/{name}/f{face}/{n,buf,vox}``) so they survive a
    jitted lax.scan multi-step; ``handler.write_links(state.diag)`` dumps
    them to ``{prefix}.{rank}`` host-side (the jit boundary cannot do file
    I/O itself) and returns the diag with counters reset.  Records past
    ``buffer_size`` between flushes are counted but not stored."""
    B = int(buffer_size)
    tag = f"link/{prefix}/"

    def _k(name, face, leaf):
        return f"{tag}{name}/f{face}/{leaf}"

    def handler(key, sp, pend, disp, acc, rhob, g: Grid, spp, face,
                diag=None):
        mask = (pend == CUSTOM_BASE + face) & sp.live
        rhob = deposit_rhob(rhob, g, sp.i, sp.dx, sp.dy, sp.dz, sp.w,
                            spp.q, mask)
        kn = _k(spp.name, face, "n")
        if diag is not None and kn in diag:
            n0 = diag[kn]
            pos = n0 + jnp.cumsum(mask.astype(jnp.int32)) - 1
            tgt = jnp.where(mask & (pos < B), pos, B)   # B rows -> dropped
            rows = jnp.stack([sp.dx, sp.dy, sp.dz,
                              sp.ux, sp.uy, sp.uz, sp.w], axis=1)
            kb, kv = _k(spp.name, face, "buf"), _k(spp.name, face, "vox")
            diag = {**diag, kn: n0 + jnp.sum(mask.astype(jnp.int32)),
                    kb: diag[kb].at[tgt].set(rows, mode="drop"),
                    kv: diag[kv].at[tgt].set(sp.i, mode="drop")}
        live = sp.live & ~mask
        sp = sp.replace(live=live, w=jnp.where(live, sp.w, 0.0),
                        np=jnp.sum(live.astype(jnp.int32)))
        pend = jnp.where(mask, DONE, pend)
        return sp, pend, disp, acc, rhob, diag

    def diag_init(sp_params, face):
        d = {}
        for spp in sp_params:
            d[_k(spp.name, face, "n")] = jnp.int32(0)
            d[_k(spp.name, face, "buf")] = jnp.zeros((B, 7), jnp.float32)
            d[_k(spp.name, face, "vox")] = jnp.zeros((B,), jnp.int32)
        return d

    def write_links(diag, rank: int = 0):
        """Append buffered records ('name face vox dx dy dz ux uy uz w'
        lines, the link.c file-per-rank analogue) and return diag with the
        counters zeroed."""
        import numpy as np
        out = dict(diag)
        with open(f"{prefix}.{rank}", "a") as fh:
            for key in sorted(diag):
                if not (key.startswith(tag) and key.endswith("/n")):
                    continue
                base = key[:-2]
                name, facestr = base[len(tag):].split("/")
                n_arr = np.asarray(diag[key]).reshape(-1)
                buf = np.asarray(diag[base + "/buf"]).reshape(-1, B, 7)
                vox = np.asarray(diag[base + "/vox"]).reshape(-1, B)
                for s in range(n_arr.size):
                    for r in range(min(int(n_arr[s]), B)):
                        fh.write(f"{name} {facestr[1:]} {vox[s, r]} "
                                 + " ".join(repr(float(v))
                                            for v in buf[s, r]) + "\n")
                out[key] = jnp.zeros_like(diag[key])
        return out

    handler.diag_init = diag_init
    handler.write_links = write_links
    handler.in_place = True
    return handler
