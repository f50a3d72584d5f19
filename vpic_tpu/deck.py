"""The deck layer: VPIC's input-deck vocabulary as a Python builder.

The reference compiles user C++ decks *into* the binary (bin/vpic.in +
deck/wrapper.h); here a deck is ordinary Python driving a ``Simulation``
builder with the same vocabulary (define_units, define_timestep,
define_periodic_grid, set_domain_field_bc, define_material,
define_field_array, define_species, set_region_field, inject_particle, ...),
which compiles to a static ``Grid`` + ``MaterialCoeffs`` and a ``SimState``
pytree, plus a single jitted ``advance`` step (src/vpic/advance.cc:15-208).

Host-side staging (particle injection, region rasterization) runs in numpy at
double precision exactly like the reference's deck execution
(misc.cc:16-100); everything per-step runs on device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dfield
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid import (ABSORB_FIELDS, ABSORB_PARTICLES, BOUNDARY, FACE_AXIS,
                   FACE_SIDE, PEC, PERIODIC, P_PERIODIC, REFLECT_PARTICLES,
                   Grid, partition_absorbing_box, partition_metal_box,
                   partition_periodic_box)
from . import boundary as B
from .ops import fields as F
from .ops import interp as I
from .ops import push as P
from .state import (FieldState, MaterialCoeffs, SimState, SpeciesParams,
                    SpeciesState)

everywhere = lambda x, y, z: True


def _run_singles(step_fn, state, n):
    for _ in range(n):
        state = step_fn(state)
    return state


@dataclass
class Material:
    name: str
    epsx: float = 1.0
    epsy: float = 1.0
    epsz: float = 1.0
    mux: float = 1.0
    muy: float = 1.0
    muz: float = 1.0
    sigmax: float = 0.0
    sigmay: float = 0.0
    sigmaz: float = 0.0
    zetax: float = 0.0
    zetay: float = 0.0
    zetaz: float = 0.0
    id: int = 0


@dataclass
class _StagedSpecies:
    params: SpeciesParams
    xs: list = dfield(default_factory=list)      # staged injections (host)


class Simulation:
    """vpic_simulation analogue (src/vpic/vpic.h:120-671)."""

    def __init__(self, seed: int = 0):
        self.grid: Optional[Grid] = None
        self.materials: List[Material] = []
        self.species: List[_StagedSpecies] = []
        self.damp = 0.0
        self._cvac = 1.0
        self._eps0 = 1.0
        self._dt = 0.0
        # High-level step-loop parameters (vpic.h:133-173)
        self.num_step = 0
        self.status_interval = 0
        self.sync_shared_interval = 0
        self.clean_div_e_interval = 0
        self.clean_div_b_interval = 0
        self.num_div_e_round = 2
        self.num_div_b_round = 2
        self.num_comm_round = 3
        self.max_streak = 4
        # Fused Pallas hot path: "auto" enables it on supported decks
        # (nz == 1; sharded, absorbing/custom-BC, emitter and injection
        # decks included -- boundary lanes are pre-flagged and replayed
        # exactly); sort staleness bounded by the window.
        self.use_pallas = "auto"
        # fused-path re-sort cadence: the factorized kernel's cost is
        # window-size-insensitive, so wider drift windows are ~free and the
        # ~2.8 ms bucket sort amortizes further (sortK 8 measured optimal:
        # 100 vs 67 M/s at sortK 4 on harris 64^2x64)
        self.pallas_sort_interval = 8
        # 2-D brick charts ("auto" = only where the window kernel's
        # NX-proportional window gets fat; see make_advance)
        self.pallas_chart2d = "auto"
        # 3-D per-brick bucketed residency ("auto" = on for 3-D chart
        # decks with no lane-reordering ops): deletes the per-step global
        # brick sort + full-capacity row gather (was ~2/3 of the 4M-tier
        # step) in favor of in-kernel compaction + outbox/inbox exchange
        # over the ~1-3% of lanes that change bricks; the full sort
        # remains as an event-driven lax.cond fallback.  See ops/residency.
        self.pallas_residency = "auto"
        # window override (lanes, multiple of 128; 0 = pick_window's
        # worst-case drift budget).  The kernel's MXU work scales with
        # window/128, and pick_window budgets ±(sortK-1) y-crossings of
        # drift that thermal decks never realize; a tighter window only
        # flags the tail lanes into the exact outlier replay.
        self.pallas_window = 0
        # bf16 split terms for the fused kernel's deposit matmuls: 2 is
        # ~2^-18 relative per deposit (one MXU pass fewer, measured on the
        # 10k drift axis: see ENERGY_AXIS.md), 3 is ~2^-27 (better than
        # f32).  The gather is always 2-term, so 2 matches the step's
        # existing arithmetic floor.
        self.pallas_deposit_terms = 2
        # User hooks (deck sections): callables state -> state pieces.
        self.user_field_injection = None      # (FieldState, step) -> FieldState
        self.user_current_injection = None    # (FieldState, step) -> FieldState
        self.user_particle_injection = None
        self.user_particle_collisions = None
        self.collision_ops: list = []
        self.emitters: list = []
        self.pbc_handlers: dict = {}   # face -> custom particle-BC handler
        # per-voxel-face particle-BC overrides (grid->neighbor analogue,
        # grid.h:116-121): (..., nv, 6) int32 codes + interior mark mask
        self._vbc = None
        self._vbc_mark = None
        self._n_region_pbc = 0
        self._entropy = np.random.RandomState(seed)
        self._sync_entropy = np.random.RandomState(seed + 0x5EED)
        self._field_init: Optional[FieldState] = None
        self._rank = 0
        # user-global blob (vpic.h:189 user_global[16384]): arbitrary
        # JSON-serializable deck state carried through checkpoint/restore
        self.user_global: dict = {}

    # ---------------- units / grid ----------------

    def seed_entropy(self, seed: int):
        self._entropy = np.random.RandomState(seed + self._rank)
        self._sync_entropy = np.random.RandomState(seed + 0x5EED)

    def rng(self, _i: int = 0) -> np.random.RandomState:
        """Deck-level RNG pool handle (rng(i) in decks)."""
        return self._entropy

    def sync_rng(self, _i: int = 0) -> np.random.RandomState:
        return self._sync_entropy

    def uniform(self, rng, lo, hi):
        return lo + (hi - lo) * rng.random_sample()

    def normal(self, rng, mu, sigma):
        return mu + sigma * rng.standard_normal()

    def define_units(self, cvac: float, eps0: float):
        self._cvac = float(cvac)
        self._eps0 = float(eps0)

    def define_timestep(self, dt: float):
        self._dt = float(dt)

    def courant_length(self, lx, ly, lz, nx, ny, nz):
        s = 0.0
        if nx > 1:
            s += (nx / lx) ** 2
        if ny > 1:
            s += (ny / ly) ** 2
        if nz > 1:
            s += (nz / lz) ** 2
        return s ** -0.5

    def define_periodic_grid(self, lo, hi, n, topology=(1, 1, 1)):
        self.grid = partition_periodic_box(
            *lo, *hi, *[int(v) for v in n], *[int(v) for v in topology],
            dt=self._dt, cvac=self._cvac, eps0=self._eps0)
        return self.grid

    def define_absorbing_grid(self, lo, hi, n, topology=(1, 1, 1),
                              pbc=ABSORB_PARTICLES):
        self.grid = partition_absorbing_box(
            *lo, *hi, *[int(v) for v in n], *[int(v) for v in topology],
            pbc=pbc, dt=self._dt, cvac=self._cvac, eps0=self._eps0)
        return self.grid

    def define_reflecting_grid(self, lo, hi, n, topology=(1, 1, 1)):
        self.grid = partition_metal_box(
            *lo, *hi, *[int(v) for v in n], *[int(v) for v in topology],
            dt=self._dt, cvac=self._cvac, eps0=self._eps0)
        return self.grid

    def size_domain(self, nx, ny, nz):
        """size_domain (vpic.h:380, grid/ops.c partition entry): a
        particle-reflecting metal box with unit spacing at the origin;
        decks then override geometry via set_domain_geometry and faces
        via set_domain_field_bc / join_domain, exactly the reference's
        size_domain -> grid->x0/dx surgery -> set_fbc/join_grid flow."""
        self.grid = partition_metal_box(
            0.0, 0.0, 0.0, float(nx), float(ny), float(nz),
            int(nx), int(ny), int(nz), 1, 1, 1,
            dt=self._dt, cvac=self._cvac, eps0=self._eps0)
        return self.grid

    def set_domain_geometry(self, x0=None, y0=None, z0=None,
                            dx=None, dy=None, dz=None):
        """The deck-side analogue of writing grid->x0/dx directly
        (sample/cygnus:88-95): rebuild the frozen Grid with the new
        corner / spacing (the Grid stores corners; spacings are derived,
        so dx overrides become x1 = x0 + dx*gnx)."""
        import dataclasses as _dc
        g = self.grid
        nx0 = g.x0 if x0 is None else float(x0)
        ny0 = g.y0 if y0 is None else float(y0)
        nz0 = g.z0 if z0 is None else float(z0)
        nx1 = nx0 + (float(dx) * g.gnx if dx is not None
                     else (g.x1 - g.x0))
        ny1 = ny0 + (float(dy) * g.gny if dy is not None
                     else (g.y1 - g.y0))
        nz1 = nz0 + (float(dz) * g.gnz if dz is not None
                     else (g.z1 - g.z0))
        self.grid = _dc.replace(g, x0=nx0, y0=ny0, z0=nz0,
                                x1=nx1, y1=ny1, z1=nz1)
        return self.grid

    def join_domain(self, boundary: int, rank: int, src_rank: int = 0):
        """join_domain (grid/ops.c:119 join_grid): connect a local face to
        another domain's opposite face.
        - self-join (rank == src_rank) on an unsharded axis: the face pair
          becomes periodic (sample/cygnus:96-97's 2-D y periodicity).
        - rank != src_rank: an irregular domain-graph join.  The grid's
          per-face partner tables (seeded from the cartesian topology the
          first time) record that src_rank's ``boundary`` face connects to
          ``rank``'s opposite face; halo exchange and particle migration
          then ride explicit flat-rank ppermute pairs (grid/ops.c:119-212's
          hand-wired port splicing).  Joins are reciprocal: the opposite
          entry on ``rank`` is updated (and any stale link unspliced), so
          each face's partner map stays a valid permutation."""
        face = int(boundary)
        if rank == src_rank:
            from .grid import P_PERIODIC, PERIODIC
            axis = face % 3
            # periodicity needs both faces of the axis; apply to the pair
            self.grid = self.grid.with_bc(axis, fbc=PERIODIC,
                                          pbc=P_PERIODIC)
            self.grid = self.grid.with_bc(axis + 3, fbc=PERIODIC,
                                          pbc=P_PERIODIC)
            return self.grid
        import dataclasses as _dc
        from .grid import cartesian_partners
        g = self.grid
        n = g.n_shards
        if not (0 <= rank < n and 0 <= src_rank < n):
            raise ValueError(
                f"join_domain({face}, {rank}, {src_rank}): ranks must be "
                f"< n_shards ({n}); partition with a topology covering "
                "every domain first")
        tabs = [list(t) for t in (g.face_partners
                                  or cartesian_partners(g))]
        opp = (face + 3) % 6

        def unlink(fc, r):
            p = tabs[fc][r]
            if p >= 0 and tabs[(fc + 3) % 6][p] == r:
                tabs[(fc + 3) % 6][p] = -1
            tabs[fc][r] = -1

        unlink(face, src_rank)
        unlink(opp, rank)
        tabs[face][src_rank] = rank
        tabs[opp][rank] = src_rank
        self.grid = _dc.replace(
            g, face_partners=tuple(tuple(t) for t in tabs))
        return self.grid

    def set_domain_field_bc(self, face: int, bc: int):
        self.grid = self.grid.with_bc(face, fbc=bc)

    def set_domain_particle_bc(self, face: int, bc):
        """bc: a built-in code (reflect/absorb/...) or a custom handler
        built by vpic_tpu.boundary_ops (maxwellian_reflux, absorb_tally...)
        -- the define/set particle-BC vocabulary (vpic.h:510-530)."""
        if callable(bc):
            self.pbc_handlers[face] = bc
            from .grid import FIRST_CUSTOM_PBC
            bc = FIRST_CUSTOM_PBC - len(self.pbc_handlers) + 1
        self.grid = self.grid.with_bc(face, pbc=bc)

    def set_region_particle_bc(self, region, bc):
        """Attach a particle BC to the SURFACE of an interior region: the
        per-voxel neighbor-table encoding of the reference (grid.h:116-121,
        decoded at boundary_p.cc:196-255), which lets decks hang reflux /
        absorb / custom surfaces on interior region boundaries instead of
        whole domain faces.  Every voxel face between a cell inside the
        region and a cell outside it gets the code ON BOTH SIDES (exit
        face of either cell).  ``bc`` is REFLECT_PARTICLES,
        ABSORB_PARTICLES, or a custom handler built by
        vpic_tpu.boundary_ops (registered under key 6 + 6*h + face and
        dispatched by boundary_p exactly like domain-face handlers; the
        geometric exit face is key % 6).  Rasterized per shard on
        decomposed grids (leading topology dims, sliced via axis_index
        inside the jitted step, like set_region_material)."""
        from .grid import ABSORB_PARTICLES, REFLECT_PARTICLES
        from .ops.push import CUSTOM_BASE
        g = self.grid
        if callable(bc):
            h = self._n_region_pbc
            self._n_region_pbc += 1
            for f in range(6):
                self.pbc_handlers[6 + 6 * h + f] = bc
            codes = [CUSTOM_BASE + 6 + 6 * h + f for f in range(6)]
        else:
            if int(bc) not in (ABSORB_PARTICLES, REFLECT_PARTICLES):
                raise ValueError("set_region_particle_bc: bc must be "
                                 "ABSORB/REFLECT or a handler")
            codes = [int(bc)] * 6

        if self._vbc is None:
            lead = g.topology if g.sharded else ()
            self._vbc = np.zeros(lead + (g.NZ, g.NY, g.NX, 6), np.int32)
            self._vbc_mark = np.zeros(lead + (g.nz, g.ny, g.nx),
                                      np.float32)

        def paint(vb, mk, sx, sy, sz):
            xc = g.x0 + g.dx * (sx * g.nx + np.arange(g.NX) - 0.5)
            yc = g.y0 + g.dy * (sy * g.ny + np.arange(g.NY) - 0.5)
            zc = g.z0 + g.dz * (sz * g.nz + np.arange(g.NZ) - 0.5)
            Z, Y, X = np.meshgrid(zc, yc, xc, indexing="ij")
            inside = np.vectorize(region, otypes=[bool])(X, Y, Z)
            aa = {0: 2, 1: 1, 2: 0}    # grid axis -> array axis
            for ax in range(3):
                a = aa[ax]
                # neighbor in +ax: nb_hi[v] = inside[v + 1]
                nb_hi = np.roll(inside, -1, axis=a)
                nb_hi[(slice(None),) * a + (-1,)] = inside[
                    (slice(None),) * a + (-1,)]
                face_hi = inside != nb_hi        # in/out face above v
                # exit face f = ax + 3 seen from v; f = ax seen from v+1
                vb[..., ax + 3][face_hi] = codes[ax + 3]
                lo_of_upper = np.roll(face_hi, 1, axis=a)
                lo_of_upper[(slice(None),) * a + (0,)] = False
                vb[..., ax][lo_of_upper] = codes[ax]
            anyf = (vb != 0).any(axis=-1)
            # Dilate by ONE cell: a corner-crossing lane may pass THROUGH
            # a marked cell mid-walk (<= 1 crossing per axis per step
            # under CFL), so any lane starting adjacent to a marked cell
            # must pre-flag too; the exact per-face code is applied by
            # the outlier replay.  Wrap on periodic axes; the extra marks
            # cost only outlier flags near surfaces, never correctness.
            dil = anyf.copy()
            for ax in range(3):
                a2 = {0: 2, 1: 1, 2: 0}[ax]
                if (g.axis_bc(ax, -1, particles=True) == 0
                        and g.topology[ax] == 1):
                    grown = (np.roll(dil, 1, a2) | np.roll(dil, -1, a2))
                else:
                    up = np.zeros_like(dil)
                    dn = np.zeros_like(dil)
                    sl_hi = [slice(None)] * 3
                    sl_hi[a2] = slice(1, None)
                    sl_lo = [slice(None)] * 3
                    sl_lo[a2] = slice(None, -1)
                    up[tuple(sl_hi)] = dil[tuple(sl_lo)]
                    dn[tuple(sl_lo)] = dil[tuple(sl_hi)]
                    grown = up | dn
                dil = dil | grown
            mk[...] = np.maximum(
                mk, dil[1:-1, 1:-1, 1:-1].astype(np.float32))

        if not g.sharded:
            paint(self._vbc, self._vbc_mark, 0, 0, 0)
        else:
            px, py, pz = g.topology
            for sx in range(px):
                for sy in range(py):
                    for sz in range(pz):
                        paint(self._vbc[sx, sy, sz],
                              self._vbc_mark[sx, sy, sz], sx, sy, sz)

    def _local_vbc(self):
        """Shard-local (nv*6,) flat per-voxel-face BC codes (or None), plus
        the interior (nz, ny, nx) kernel mark mask."""
        if self._vbc is None:
            return None, None
        g = self.grid
        vb = jnp.asarray(self._vbc)
        mk = jnp.asarray(self._vbc_mark)
        if g.sharded:
            idx = tuple(jax.lax.axis_index(a) for a in g.mesh_axes)
            vb = vb[idx]
            mk = mk[idx]
        return vb.reshape(-1), mk

    def define_surface_emitter(self, emitter_factory, region, sp: SpeciesParams,
                               **kw):
        """define_surface_emitter (deck/wrapper.h:310-383): scan the region's
        surface into a static component list and register the emission op."""
        from . import emitter as E
        comps = E.surface_components(self.grid, region)
        op = emitter_factory(sp.id, sp, comps, **kw)
        self.emitters.append(op)
        return op

    def define_volume_emitter(self, emitter_factory, region,
                              sp: SpeciesParams, **kw):
        """define_volume_emitter (deck/wrapper.h:348-383): every face of
        every in-region cell becomes an emission component."""
        from . import emitter as E
        comps = E.volume_components(self.grid, region)
        op = emitter_factory(sp.id, sp, comps, **kw)
        self.emitters.append(op)
        return op

    # ---------------- materials / field array ----------------

    def define_material(self, name, eps=1.0, mu=1.0, sigma=0.0, zeta=0.0,
                        **tensor) -> Material:
        def three(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)

        ex, ey, ez = three(tensor.get("eps", eps))
        mx, my, mz = three(tensor.get("mu", mu))
        sx, sy, sz = three(tensor.get("sigma", sigma))
        zx, zy, zz = three(tensor.get("zeta", zeta))
        m = Material(name, ex, ey, ez, mx, my, mz, sx, sy, sz, zx, zy, zz,
                     id=len(self.materials))
        self.materials.append(m)
        return m

    def lookup_material(self, name: str) -> Material:
        for m in self.materials:
            if m.name == name:
                return m
        raise KeyError(name)

    def define_field_array(self, _kernels=None, damp: float = 0.0):
        self.damp = float(damp)
        self._field_ops = []
        # Material-id meshes at the 8 stagger classes (field_t material
        # members, field_advance.h:152-160), filled by set_region_material.
        g = self.grid
        self._mat_ids = {k: np.zeros(g.shape, np.int16)
                         for k in ("ematx", "ematy", "ematz", "nmat",
                                   "fmatx", "fmaty", "fmatz", "cmat")}
        self._multi_material = False

    def set_region_material(self, region, volume_mat, surface_mat=None):
        """set_region_material (deck/wrapper.h:211-253): assign the volume
        material to every stagger location fully inside the region and the
        surface material to locations partially inside.  On a decomposed
        grid every shard's ghosted brick is rasterized with its own global
        coordinate offsets (the reference's region macros run per MPI rank
        the same way), giving id meshes with leading topology dims."""
        if isinstance(volume_mat, str):
            volume_mat = self.lookup_material(volume_mat)
        if isinstance(surface_mat, str):
            surface_mat = self.lookup_material(surface_mat)
        if surface_mat is None:
            surface_mat = volume_mat
        g = self.grid
        self._multi_material = True
        if g.sharded and self._mat_ids["cmat"].ndim == 3:
            self._mat_ids = {k: np.zeros(g.topology + g.shape, np.int16)
                             for k in self._mat_ids}

        def paint(ids_view, sx, sy, sz):
            xc = g.x0 + g.dx * (sx * g.nx + np.arange(g.NX) - 0.5)
            yc = g.y0 + g.dy * (sy * g.ny + np.arange(g.NY) - 0.5)
            zc = g.z0 + g.dz * (sz * g.nz + np.arange(g.NZ) - 0.5)
            Z, Y, X = np.meshgrid(zc, yc, xc, indexing="ij")
            inside = np.vectorize(region, otypes=[bool])(X, Y, Z)

            def sh(dz, dy, dx):
                """inside(cell shifted -d), i.e. out[v] = inside[v - d];
                False beyond the array edge.  Offsets are 0 or 1."""
                NZ, NY, NX = inside.shape
                out = np.zeros_like(inside)
                out[dz:, dy:, dx:] = inside[:NZ - dz, :NY - dy, :NX - dx]
                return out

            ccc = inside
            lcc = sh(0, 0, 1)   # cell (i-1, j, k) relative to voxel i
            clc = sh(0, 1, 0)
            llc = sh(0, 1, 1)
            ccl = sh(1, 0, 0)
            lcl = sh(1, 0, 1)
            cll = sh(1, 1, 0)
            lll = sh(1, 1, 1)

            combos = dict(
                ematx=(ccc, clc, ccl, cll), ematy=(ccc, ccl, lcc, lcl),
                ematz=(ccc, lcc, clc, llc), fmatx=(ccc, lcc),
                fmaty=(ccc, clc), fmatz=(ccc, ccl),
                nmat=(ccc, lcc, clc, llc, ccl, lcl, cll, lll))
            for name, cells in combos.items():
                any_in = np.logical_or.reduce(cells)
                all_in = np.logical_and.reduce(cells)
                ids = ids_view[name]
                ids[any_in] = surface_mat.id
                ids[all_in] = volume_mat.id
            ids_view["cmat"][ccc] = volume_mat.id

        if not g.sharded:
            paint(self._mat_ids, 0, 0, 0)
        else:
            px, py, pz = g.topology
            for sx in range(px):
                for sy in range(py):
                    for sz in range(pz):
                        paint({k: v[sx, sy, sz]
                               for k, v in self._mat_ids.items()},
                              sx, sy, sz)

    def _axis_coeffs(self, sigma, eps):
        """Exponential differencing coefficients (sfa.c:115-133)."""
        g = self.grid
        ax = (sigma * g.dt) / (eps * g.eps0)
        decay = math.exp(-ax)
        if ax == 0:
            drive = 1.0 / eps
        elif decay == 0:
            drive = 0.0
        else:
            drive = 2.0 * math.exp(-0.5 * ax) * math.sinh(0.5 * ax) / (ax * eps)
        return decay, drive

    def _material_coeffs(self) -> MaterialCoeffs:
        """create_sfa_params (sfa.c:55-151).  Single material -> 0-d scalar
        coefficients (the vacuum fast-kernel analogue, sfa.c:202-211);
        region-assigned multi-material meshes pre-expand the per-material
        tables onto the stagger-matched id meshes (gather-free stencils,
        the TPU-idiomatic memory/bandwidth tradeoff)."""
        if not self.materials:
            raise RuntimeError("no materials defined")
        if not getattr(self, "_multi_material", False):
            m = self.materials[0]
            dx_, vx = self._axis_coeffs(m.sigmax, m.epsx)
            dy_, vy = self._axis_coeffs(m.sigmay, m.epsy)
            dz_, vz = self._axis_coeffs(m.sigmaz, m.epsz)
            noncond = 1.0 if (m.sigmax == 0 and m.sigmay == 0
                              and m.sigmaz == 0) else 0.0
            fl = lambda v: jnp.float32(v)
            return MaterialCoeffs(
                decayx=fl(dx_), decayy=fl(dy_), decayz=fl(dz_),
                drivex=fl(vx), drivey=fl(vy), drivez=fl(vz),
                rmux=fl(1.0 / m.mux), rmuy=fl(1.0 / m.muy),
                rmuz=fl(1.0 / m.muz), nonconductive=fl(noncond),
                epsx=fl(m.epsx), epsy=fl(m.epsy), epsz=fl(m.epsz))

        nm = len(self.materials)
        decay = np.zeros((nm, 3), np.float32)
        drive = np.zeros((nm, 3), np.float32)
        rmu = np.zeros((nm, 3), np.float32)
        noncond = np.zeros((nm,), np.float32)
        eps = np.zeros((nm, 3), np.float32)
        for m in self.materials:
            for a, (sg, ep) in enumerate(((m.sigmax, m.epsx),
                                          (m.sigmay, m.epsy),
                                          (m.sigmaz, m.epsz))):
                decay[m.id, a], drive[m.id, a] = self._axis_coeffs(sg, ep)
            rmu[m.id] = (1.0 / m.mux, 1.0 / m.muy, 1.0 / m.muz)
            eps[m.id] = (m.epsx, m.epsy, m.epsz)
            noncond[m.id] = 1.0 if (m.sigmax == 0 and m.sigmay == 0
                                    and m.sigmaz == 0) else 0.0
        ids = self._mat_ids
        j = jnp.asarray
        return MaterialCoeffs(
            decayx=j(decay[ids["ematx"], 0]), decayy=j(decay[ids["ematy"], 1]),
            decayz=j(decay[ids["ematz"], 2]),
            drivex=j(drive[ids["ematx"], 0]), drivey=j(drive[ids["ematy"], 1]),
            drivez=j(drive[ids["ematz"], 2]),
            rmux=j(rmu[ids["fmatx"], 0]), rmuy=j(rmu[ids["fmaty"], 1]),
            rmuz=j(rmu[ids["fmatz"], 2]),
            nonconductive=j(noncond[ids["nmat"]]),
            epsx=j(eps[ids["ematx"], 0]), epsy=j(eps[ids["ematy"], 1]),
            epsz=j(eps[ids["ematz"], 2]))

    def _local_material_coeffs(self, m: MaterialCoeffs) -> MaterialCoeffs:
        """Shard-local view of multi-material coefficient meshes: built
        with leading (px,py,pz) dims by set_region_material, sliced to this
        shard inside shard_map via the mesh axis indices (the analogue of
        each MPI rank holding its own sfa_params tables).  No-op for scalar
        (single-material) coefficients or unsharded grids."""
        g = self.grid
        if not (g.sharded and getattr(self, "_multi_material", False)):
            return m
        idx = tuple(jax.lax.axis_index(a) for a in g.mesh_axes)
        return jax.tree.map(
            lambda a: a[idx] if getattr(a, "ndim", 0) >= 3 else a, m)

    # ---------------- species / particles ----------------

    def define_species(self, name, q, m, max_local_np, max_local_nm=-1,
                       sort_interval=0, sort_out_of_place=1) -> SpeciesParams:
        p = SpeciesParams(name=name, q=float(q), m=float(m),
                          capacity=int(math.ceil(max_local_np)),
                          sort_interval=int(sort_interval),
                          id=len(self.species))
        self.species.append(_StagedSpecies(params=p))
        return p

    def _staged(self, sp: SpeciesParams) -> _StagedSpecies:
        return self.species[sp.id]

    def inject_particle(self, sp: SpeciesParams, x, y, z, ux, uy, uz, w,
                        age=0.0, update_rhob=0):
        """Robust global -> (voxel, offset) conversion in double precision
        (misc.cc:16-100).  Host-side; device-side runtime injection is
        provided by the emission module."""
        g = self.grid
        if w < 0:
            raise ValueError("inject_particle: w < 0")
        # Local-domain corners for this (single-host staging) rank; sharded
        # decks stage per-shard in parallel/migrate.py.
        x0, y0, z0, x1, y1, z1 = g.x0, g.y0, g.z0, g.x1, g.y1, g.z1
        if not (x0 <= x <= x1 and y0 <= y <= y1 and z0 <= z <= z1):
            return
        nx, ny, nz = g.gnx, g.gny, g.gnz

        def conv(v, v0, v1, n):
            v = float(n) * ((v - v0) / (v1 - v0))
            iv = int(v)
            v -= iv
            v = (v + v) - 1.0
            if iv == n:
                v = 1.0
                iv = n - 1
            return v, iv + 1

        dx, ix = conv(x, x0, x1, nx)
        dy, iy = conv(y, y0, y1, ny)
        dz, iz = conv(z, z0, z1, nz)
        self._staged(sp).xs.append(
            (dx, dy, dz, ix, iy, iz, ux, uy, uz, w, age, update_rhob))

    # ---------------- field loading ----------------

    def set_region_field(self, region, ex=0, ey=0, ez=0, bx=0, by=0, bz=0):
        """set_point_region_field (deck/wrapper.h:190-210): evaluate each
        component's expression at its Yee stagger position (over ghosts too)
        wherever ``region(x,y,z)`` holds.  Expressions are scalars or
        callables f(x, y, z); B is stored internally as cB.  Recorded here,
        materialized per shard at initialize()."""
        self._field_ops.append((region, dict(ex=ex, ey=ey, ez=ez,
                                             bx=bx, by=by, bz=bz)))

    def _local_corner(self, sx: int, sy: int, sz: int):
        g = self.grid
        return (g.x0 + sx * g.nx * g.dx,
                g.y0 + sy * g.ny * g.dy,
                g.z0 + sz * g.nz * g.dz)

    def _materialize_fields(self, shard=(0, 0, 0)) -> np.ndarray:
        """Evaluate the recorded region-field ops on one shard's local
        ghosted mesh; returns 6 numpy arrays (ex, ey, ez, cbx, cby, cbz)."""
        g = self.grid
        c = g.cvac
        x0, y0, z0 = self._local_corner(*shard)
        xn = x0 + g.dx * (np.arange(g.NX) - 1.0)
        yn = y0 + g.dy * (np.arange(g.NY) - 1.0)
        zn = z0 + g.dz * (np.arange(g.NZ) - 1.0)
        xc, yc, zc = xn + 0.5 * g.dx, yn + 0.5 * g.dy, zn + 0.5 * g.dz

        out = {k: np.zeros(g.shape, np.float32)
               for k in ("ex", "ey", "ez", "cbx", "cby", "cbz")}
        # Yee stagger sample positions (wrapper.h:196-207).
        stagger = dict(ex=(xc, yn, zn), ey=(xn, yc, zn), ez=(xn, yn, zc),
                       cbx=(xn, yc, zc), cby=(xc, yn, zc), cbz=(xc, yc, zn))
        scales = dict(ex=1.0, ey=1.0, ez=1.0, cbx=c, cby=c, cbz=c)
        keymap = dict(ex="ex", ey="ey", ez="ez", bx="cbx", by="cby", bz="cbz")

        for region, exprs in self._field_ops:
            for ekey, expr in exprs.items():
                name = keymap[ekey]
                xs, ys, zs = stagger[name]
                Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
                if callable(expr):
                    vals = np.vectorize(expr, otypes=[np.float64])(X, Y, Z)
                else:
                    vals = np.full(X.shape, float(expr))
                if callable(region):
                    mask = np.vectorize(region, otypes=[bool])(X, Y, Z)
                else:
                    mask = np.full(X.shape, bool(region))
                out[name] = np.where(mask, scales[name] * vals,
                                     out[name]).astype(np.float32)
        return out

    # ---------------- initialize (initialize.cc:5-64) ----------------

    def _pack_species(self):
        """Stage injected particles into device buffers; with a sharded grid,
        bin per shard (global voxel -> (shard, local voxel)) and add the 3
        leading mesh dims.  Returns (species_states, update_rhob_masks)."""
        g = self.grid
        px, py, pz = g.topology
        out, urbs, ages = [], [], []
        for st in self.species:
            cap = st.params.capacity
            a = np.asarray([r[:10] for r in st.xs], np.float64) \
                if st.xs else np.zeros((0, 10))
            age = np.asarray([r[10] for r in st.xs], np.float64) \
                if st.xs else np.zeros((0,))
            urb = np.asarray([r[11] for r in st.xs], bool) \
                if st.xs else np.zeros((0,), bool)
            gi = a[:, 3].astype(np.int64) if len(a) else np.zeros(0, np.int64)
            gj = a[:, 4].astype(np.int64) if len(a) else np.zeros(0, np.int64)
            gk = a[:, 5].astype(np.int64) if len(a) else np.zeros(0, np.int64)
            sx = (gi - 1) // g.nx
            sy_ = (gj - 1) // g.ny
            sz_ = (gk - 1) // g.nz
            li = gi - sx * g.nx
            lj = gj - sy_ * g.ny
            lk = gk - sz_ * g.nz
            vox = (li + g.NX * (lj + g.NY * lk)).astype(np.int32)

            shape = (px, py, pz, cap)
            fbuf = {k: np.zeros(shape, np.float32)
                    for k in ("dx", "dy", "dz", "ux", "uy", "uz", "w")}
            ibuf = np.zeros(shape, np.int32)
            lbuf = np.zeros(shape, bool)
            ubuf = np.zeros(shape, bool)
            abuf = np.zeros(shape, np.float32)
            counts = np.zeros((px, py, pz), np.int32)
            shard_flat = (sx * py + sy_) * pz + sz_
            order = np.argsort(shard_flat, kind="stable")
            for idx in order:
                s = (int(sx[idx]), int(sy_[idx]), int(sz_[idx]))
                c = counts[s]
                if c >= cap:
                    raise RuntimeError(
                        f"species {st.params.name}: shard {s} overflows "
                        f"capacity {cap}")
                fbuf["dx"][s + (c,)] = a[idx, 0]
                fbuf["dy"][s + (c,)] = a[idx, 1]
                fbuf["dz"][s + (c,)] = a[idx, 2]
                fbuf["ux"][s + (c,)] = a[idx, 6]
                fbuf["uy"][s + (c,)] = a[idx, 7]
                fbuf["uz"][s + (c,)] = a[idx, 8]
                fbuf["w"][s + (c,)] = a[idx, 9]
                ibuf[s + (c,)] = vox[idx]
                lbuf[s + (c,)] = True
                ubuf[s + (c,)] = urb[idx]
                abuf[s + (c,)] = age[idx]
                counts[s] = c + 1

            def maybe_squeeze(arr):
                return arr[0, 0, 0] if not g.sharded else arr

            s = SpeciesState(
                dx=jnp.asarray(maybe_squeeze(fbuf["dx"])),
                dy=jnp.asarray(maybe_squeeze(fbuf["dy"])),
                dz=jnp.asarray(maybe_squeeze(fbuf["dz"])),
                i=jnp.asarray(maybe_squeeze(ibuf)),
                ux=jnp.asarray(maybe_squeeze(fbuf["ux"])),
                uy=jnp.asarray(maybe_squeeze(fbuf["uy"])),
                uz=jnp.asarray(maybe_squeeze(fbuf["uz"])),
                w=jnp.asarray(maybe_squeeze(fbuf["w"])),
                live=jnp.asarray(maybe_squeeze(lbuf)),
                np=(jnp.asarray(counts) if g.sharded
                    else jnp.int32(counts[0, 0, 0])))
            out.append(s)
            urbs.append(jnp.asarray(maybe_squeeze(ubuf)))
            ages.append(jnp.asarray(maybe_squeeze(abuf))
                        if age.any() else None)
        return tuple(out), tuple(urbs), tuple(ages)

    def _build_initial_fields(self):
        """Materialize the recorded region-field ops into a FieldState (with
        the 3 leading mesh dims when sharded)."""
        g = self.grid
        px, py, pz = g.topology
        if not g.sharded:
            vals = self._materialize_fields((0, 0, 0))
            f = FieldState.zeros(g)
            return f.replace(**{k: jnp.asarray(v) for k, v in vals.items()})
        comps = {k: np.zeros((px, py, pz) + g.shape, np.float32)
                 for k in ("ex", "ey", "ez", "cbx", "cby", "cbz")}
        for sx in range(px):
            for sy in range(py):
                for sz in range(pz):
                    vals = self._materialize_fields((sx, sy, sz))
                    for k, v in vals.items():
                        comps[k][sx, sy, sz] = v
        z = jnp.zeros((px, py, pz) + g.shape, jnp.float32)
        f = FieldState(**{k: jnp.asarray(comps[k]) if k in comps else z
                          for k in ("ex", "ey", "ez", "cbx", "cby", "cbz",
                                    "tcax", "tcay", "tcaz", "jfx", "jfy",
                                    "jfz", "rhof", "rhob", "div_e_err",
                                    "div_b_err")})
        return f

    def initialize(self, key=None) -> SimState:
        """Post-deck derived-state fixups (initialize.cc:5-64)."""
        g = self.grid
        if g.face_partners is not None:
            # A rank whose face carries P_REMOTE but has no partner in the
            # join table would park its exiting particles for a migration
            # that never happens (boundary._face_perm excludes unjoined
            # ranks from the ppermute pairs): silent particle loss with no
            # rhob deposit.  join_domain's unsplicing makes this state easy
            # to reach; refuse it here instead (grid/ops.c:119-212 joins
            # must leave every remote port wired).
            from .grid import P_REMOTE as _P_REMOTE
            for face in range(6):
                if g.particle_bc[face] != _P_REMOTE:
                    continue
                bad = [r for r, p in enumerate(g.face_partners[face])
                       if p < 0]
                if bad:
                    raise ValueError(
                        f"initialize(): face {face} has particle bc "
                        f"P_REMOTE but ranks {bad} are unjoined in the "
                        "domain graph -- their exiting particles would be "
                        "silently destroyed.  join_domain() every rank's "
                        "face or set an explicit per-face particle BC "
                        "(set_domain_particle_bc) first.")
        m_global = self._material_coeffs()
        f = self._build_initial_fields()
        species, urbs, ages = self._pack_species()

        def _init(state_in):
            f, species, urbs, ages = state_in
            m = self._local_material_coeffs(m_global)
            rhob = f.rhob.reshape(-1)
            for st, sp, urb in zip(self.species, species, urbs):
                rhob = P.deposit_rhob(rhob, g, sp.i, sp.dx, sp.dy, sp.dz,
                                      sp.w, -st.params.q, urb & sp.live)
            # Aged injection (misc.cc:88-99): particles staged with
            # age != 0 get the partial push NOW -- displacement
            # u * age * cvac * dt / gamma through the exact streak walk
            # (boundary interactions included: reflect bounces, absorbs
            # kill with their rhob deposit, like move_p at injection).
            # The walk's current deposits are discarded, matching the
            # reference where clear_accumulator_array at the top of the
            # first advance() wipes injection-time accumulator activity.
            species = list(species)
            for k, (st, agearr) in enumerate(zip(self.species, ages)):
                if agearr is None:
                    continue
                sp = species[k]
                spp = st.params
                gam = jnp.sqrt(1.0 + sp.ux ** 2 + sp.uy ** 2 + sp.uz ** 2)
                aged = agearr * (g.cvac * g.dt) / gam
                disp = (sp.ux * aged * g.rdx, sp.uy * aged * g.rdy,
                        sp.uz * aged * g.rdz)
                zi, r_ = jnp.divmod(sp.i, g.sz)
                yi, xi = jnp.divmod(r_, g.sy)
                pend = jnp.full((spp.capacity,), P.DONE, jnp.int32)
                acc0 = jnp.zeros((g.nv, 12), jnp.float32)
                mask = sp.live & (agearr != 0.0)
                (pos, _, coords, u, alive, pend, _, rhob) = P.streak_walk(
                    g, spp.q, sp.w, (sp.dx, sp.dy, sp.dz), disp,
                    (xi, yi, zi), (sp.ux, sp.uy, sp.uz), mask, sp.live,
                    pend, acc0, rhob, self.max_streak)
                vox2 = coords[0] + g.NX * (coords[1] + g.NY * coords[2])
                species[k] = sp.replace(
                    dx=pos[0], dy=pos[1], dz=pos[2], i=vox2,
                    ux=u[0], uy=u[1], uz=u[2],
                    w=jnp.where(alive, sp.w, 0.0), live=alive,
                    np=jnp.sum(alive.astype(jnp.int32)))
            species = tuple(species)
            f = f.replace(rhob=rhob.reshape(g.shape))
            f, _ = F.synchronize_tang_e_norm_b(f, g)
            f = F.compute_div_b_err(f, g)
            f = F.clean_div_b(f, g)
            f = F.compute_curl_b(f, g, m)
            f = F.clear_rhof(f)
            rhof = f.rhof.reshape(-1)
            for st, sp in zip(self.species, species):
                rhof = P.accumulate_rho_p(rhof, sp, g, st.params.q)
            f = f.replace(rhof=rhof.reshape(g.shape))
            f = F.synchronize_rho(f, g)
            f = F.compute_rhob(f, g, m)
            f = F.compute_div_e_err(f, g, m)
            f = F.clean_div_e(f, g, m)
            f, _ = F.synchronize_tang_e_norm_b(f, g)
            fcoef = I.load_interpolator(f, g)
            species = tuple(
                P.uncenter_p(sp, fcoef, g, st.params.q, st.params.m)
                for st, sp in zip(self.species, species))
            return f, species

        if g.sharded:
            from .parallel.mesh import make_mesh, shard_fn
            mesh = make_mesh(g)
            f, species = jax.jit(shard_fn(_init, g, mesh))(
                (f, species, urbs, ages))
        else:
            f, species = jax.jit(_init)((f, species, urbs, ages))
        if key is None:
            key = jax.random.PRNGKey(self._entropy.randint(0, 2**31 - 1))
        step0 = jnp.int32(0)
        # pre-create the jit-carried diagnostics keys (custom-BC tallies,
        # link buffers) so the dict structure is fixed for lax.scan
        diag = {}
        sp_params = [st.params for st in self.species]
        for face, h in self.pbc_handlers.items():
            if hasattr(h, "diag_init"):
                diag.update(h.diag_init(sp_params, face))
        for cop in self.collision_ops:
            if hasattr(cop, "diag_init"):
                diag.update(cop.diag_init())
        if self._fused_mode()[2]:
            res_on, res_slack = self._residency_mode()
            if res_on:
                # residency decks work on static [0, E) extent slices:
                # the home maps match the sliced block count, and
                # _res_valid = 0 makes the first advance's pre-push cond
                # run the slack-padded brick sort once
                from .ops import residency as _RES
                exts = _RES.extents(
                    g, [max(len(st.xs), 1) for st in self.species],
                    res_slack)
                for k, E in enumerate(exts):
                    diag[f"_chart_home{k}"] = jnp.zeros(
                        (E // 1024,), jnp.int32)
                diag["_res_valid"] = jnp.int32(0)
                diag["_res_rebuckets"] = jnp.int32(0)
            else:
                # chart-kernel decks carry per-species block ->
                # home-brick maps (written by the brick sort, read by
                # the push); zeros here -- the first advance sorts at
                # step 0 before pushing
                for k, spp in enumerate(sp_params):
                    diag[f"_chart_home{k}"] = jnp.zeros(
                        ((spp.capacity + 1023) // 1024,), jnp.int32)
        if g.sharded:
            step0 = jnp.zeros(g.topology, jnp.int32)
            key = jnp.broadcast_to(key, g.topology + key.shape)
            diag = {k: jnp.broadcast_to(v, g.topology + v.shape)
                    for k, v in diag.items()}
        return SimState(fields=f, species=species, step=step0, rng=key,
                        diag=diag)

    # ---------------- the step (advance.cc:15-208) ----------------

    def _fused_mode(self):
        """(use_fused, fused2, fused3, sortK) -- the kernel-path decision,
        shared by make_advance and initialize (which must pre-seed the
        jit-carried chart home maps when fused3 will run)."""
        from .ops import pallas_push as PP
        from .ops import pallas_push3d as PP3
        g = self.grid
        max_cap = max((st.params.capacity for st in self.species),
                      default=0)
        on_tpu = jax.devices()[0].platform == "tpu"
        # Irregular domain graphs (join_domain) run fused since round 4:
        # joined faces read as remote in _eff_bc, so ALL their crossers
        # are pre-flagged and replayed by the exact XLA outlier pass with
        # the general path's traced per-rank routing.
        chart_ok = PP3.supports3d(g, max_cap)
        sortK = max(1, self.pallas_sort_interval)
        # Chart home maps are computed by the brick sort and stay valid
        # only while lane SLOTS are stable: any op that reorders lanes
        # between sorts (migration compaction, emitter/user injection
        # appends, collision voxel shuffles) forces a sort every step.
        reorders = (g.sharded or bool(self.emitters)
                    or self.user_particle_injection is not None
                    or bool(self.collision_ops)
                    or self.user_particle_collisions is not None)
        if g.nz > 1:
            fused3 = chart_ok and (on_tpu or self.use_pallas is True)
        elif self.pallas_chart2d == "auto":
            # ROUND-4 RE-MEASURED v5e cutover: the round-3 ADAPTIVE
            # per-block windows (w0 re-anchored at each block's live-min
            # every step) removed the window footprint's NX growth, and
            # windows now beat 2-D charts at EVERY tier -- pure decks
            # 145.7/151.0/128.6 vs charts 115.8/136.2/117.6 at 128^2x64 /
            # 128^2x256 / 256^2x64 (both sortK=8), and lane-reordering
            # (collision) decks by >2x (157.2/143.1/145.6/124.8 vs
            # per-step-sorted charts 68.4/64.7/65.0/55.7).  The round-2
            # chart cutover data predated adaptive windows; auto is now
            # windows-always for 2-D.  pallas_chart2d=True still forces
            # charts (scripts/chart_cutover_reorder.py re-measures).
            fused3 = False
        else:
            fused3 = chart_ok and self.pallas_chart2d is True
        fused2 = (not fused3) and PP.supports(g, max_cap)
        if self.use_pallas == "auto":
            use_fused = fused2 or fused3
        else:
            use_fused = bool(self.use_pallas) and (fused2 or fused3)
        if fused3:
            if g.nz > 1:
                # 1-deep halos: sorting every step makes chart exits
                # impossible (<= 1 face crossing per axis per step) ->
                # zero outlier churn; measured 33.1 vs 16.5 Mpush/s at
                # sortK 1 vs 2 on 32^3
                sortK = 1
            elif reorders:
                sortK = 1
            else:
                # 2-D charts carry CH2_HALO-deep halos: the brick sort
                # only has to outrun the halo
                sortK = min(sortK, PP3.CH2_HALO)
        return use_fused, fused2, fused3, sortK

    def _residency_mode(self):
        """(enabled, slack) -- per-brick bucketed residency (3-D chart
        decks, ops/residency).  Requires a stable lane layout between
        rebuckets: no migration, no appends, no collision shuffles, only
        in-place custom BC handlers -- plus enough capacity for the
        slack-padded quantized layout."""
        g = self.grid
        knob = self.pallas_residency
        if knob is False or g is None:
            return False, 0
        supported = g.nz > 1 and not g.sharded
        if supported:
            use_fused, _, fused3, _ = self._fused_mode()
            supported = use_fused and fused3
        if supported:
            # Built-in collision ops with a static interval >= 2 are
            # allowed: they shuffle lanes only on their cadence, and the
            # advance invalidates the layout exactly on those steps
            # (rebucket pre-push) -- the full sort runs every interval
            # steps instead of every step.  interval <= 1 would rebucket
            # every step (strictly worse than the per-step-sort path).
            coll_ok = all(getattr(op, "interval", 0) >= 2
                          or getattr(op, "interval", 1) <= 0  # never fires
                          for op in self.collision_ops)
            reorders = (bool(self.emitters) or not coll_ok
                        or self.user_particle_injection is not None
                        or self.user_particle_collisions is not None)
            handlers_in_place = all(getattr(h, "in_place", False)
                                    for h in self.pbc_handlers.values())
            supported = (not reorders) and handlers_in_place
        slack = 0
        if supported:
            from .ops import residency as RES
            n0 = [max(len(st.xs), 1) for st in self.species]
            caps = [st.params.capacity for st in self.species]
            slack = RES.slack_blocks(g, n0, caps)
            supported = slack >= 1
        if not supported:
            if knob is True:
                raise ValueError(
                    "pallas_residency=True needs a 3-D brick-chart deck "
                    "with no lane-reordering ops (emitters/collisions/"
                    "injection/migration), in-place BC handlers, and "
                    "capacity headroom for at least one slack block per "
                    "brick")
            return False, 0
        return True, slack

    def make_advance(self, sort_static=None) -> Callable[[SimState], SimState]:
        """sort_static: None -> the fused-path sort rides a step%sortK
        lax.cond (a cond costs ~30-130 us on the tunneled chip even when
        false); True/False -> sort unconditionally / never (make_multi_step
        builds statically-phased sortK groups from the pair, eliminating
        the per-step cond)."""
        g = self.grid
        if self.pallas_window:
            # the kernel's h-major table slice floors w0//128: a non-128-
            # multiple window misaligns clipped w0 values silently
            # (corrupt deposits, the d9cf69d bug class) -- reject early
            if self.pallas_window % 128 or self.pallas_window < 256:
                raise ValueError(
                    f"pallas_window={self.pallas_window} must be a multiple "
                    "of 128 and >= 256 (lanes)")
        m_global = self._material_coeffs()
        damp = self.damp
        sp_params = [st.params for st in self.species]
        collision_ops = tuple(self.collision_ops)
        emitters = tuple(self.emitters)
        u_field = self.user_field_injection
        u_current = self.user_current_injection
        u_pinject = self.user_particle_injection
        u_collide = self.user_particle_collisions

        from .ops import pallas_push as PP
        from .ops import pallas_push3d as PP3
        max_cap = max((st.params.capacity for st in self.species), default=0)
        # Kernel-path policy notes:
        # * 3-D (interpret mode too slow off-TPU): auto-enable on TPU
        #   only; use_pallas=True forces it anywhere (parity tests do).
        # * Per-voxel BC surfaces: the 2-D window kernel pre-flags via the
        #   table mark row; the chart kernel doesn't carry the row yet, so
        #   such decks take the window kernel (2-D) / general path (3-D).
        # * 2-D chart-vs-window: charts keep the per-block footprint at
        #   768 lanes regardless of NX, windows grow ~ NX * sortK; the
        #   MEASURED v5e policy picks windows by default (auto);
        #   pallas_chart2d=True forces charts (parity-tested).
        use_fused, fused2, fused3, sortK = self._fused_mode()
        residency_on, res_slack = self._residency_mode()
        if residency_on:
            from .ops import residency as RES
            # static extents: the whole residency path runs on [0, E)
            # slices -- the dead capacity tail (headroom) never moves
            res_exts = RES.extents(
                g, [max(len(st.xs), 1) for st in self.species],
                res_slack)
            _, res_spid, res_usable = RES.static_layout(res_exts)

        # Static per-species LIVE-slot bounds for extent sorts: the sort's
        # row gather pays a flat ~6.4 ns/row latency floor over the whole
        # capacity, so skipping the dead slack (capacity is typically
        # ~1.5x the injected count) cuts sort cost ~proportionally.  Valid
        # only when nothing can GROW the live count or move a live lane
        # past it: kills (absorbing walls, custom handlers) happen in
        # place, and every lane-moving op in the package -- both fused
        # sorts AND the collision shuffle_sort -- packs live lanes first,
        # so live slots stay inside the initial-injection bound forever.
        # Migration (sharded), emission, injection, and unknown user
        # collision callbacks can grow/relocate: full-capacity sorts then.
        # Third-party custom particle-BC handlers get the full SpeciesState
        # and may legally place replacement particles in free tail slots;
        # only the in-package built-ins (marked handler.in_place) are known
        # to act in place, so unknown handlers disqualify extent sorts.
        handlers_in_place = all(getattr(h, "in_place", False)
                                for h in self.pbc_handlers.values())
        no_growth = (not g.sharded and not emitters and handlers_in_place
                     and u_pinject is None and u_collide is None)
        sort_extents = [max(len(st.xs), 1) if no_growth else 0
                        for st in self.species]

        def advance(state: SimState) -> SimState:
            f = state.fields
            species = list(state.species)
            step = state.step
            rng = state.rng
            m = self._local_material_coeffs(m_global)
            vbc, vbc_mark = self._local_vbc()
            # jit-carried diagnostics (custom-BC tallies etc.); structure is
            # fixed at initialize() so it can ride a lax.scan carry
            diag = state.diag if state.diag is not None else {}

            # --- sort (performance + collision partition) ---
            if not use_fused:
                for k, spp in enumerate(sp_params):
                    if spp.sort_interval > 0:
                        species[k] = jax.lax.cond(
                            step % spp.sort_interval == 0,
                            P.sort_p, lambda s: s, species[k])

            # --- collisions (before push; advance.cc:45-47) ---
            for op in collision_ops:
                if getattr(op, "has_diag", False):
                    species, rng, diag = op(species, f, g, step, rng, diag)
                else:
                    species, rng = op(species, f, g, step, rng)
            if u_collide is not None:
                species, rng = u_collide(species, f, g, step, rng)

            rhob = f.rhob.reshape(-1)

            if use_fused:
                # Fused Pallas hot path: one kernel per species fusing
                # gather + Boris + streak walk + MXU one-hot deposition.
                # Wall crossers (absorb/custom faces) are pre-flagged by
                # the kernel and replayed exactly by outlier_pass.
                if fused3:
                    # brick-chart kernel: canonical table + chart copy
                    # (2-D charts skip the unwrapped-y image expansion:
                    # charts wrap y through their own halos)
                    window = PP.DEF_WINDOW
                    nvp = PP.table_width(g, window)
                    fcoef_T = I.load_interpolator_T(f, g, nvp,
                                                    mark=vbc_mark,
                                                    y_images=g.nz > 1)
                    tab_chart = PP3.to_chart_T(fcoef_T, g)
                    acc_T = jnp.zeros((16, PP3.chart_width(g)), jnp.float32)
                else:
                    window = self.pallas_window or PP.pick_window(g, sortK)
                    nvp = PP.table_width(g, window)
                    fcoef_T = I.load_interpolator_T(f, g, nvp,
                                                    mark=vbc_mark)
                    acc_T = jnp.zeros((16, nvp), jnp.float32)
                acc_small = jnp.zeros((g.nv, 12), jnp.float32)
                bkey = ekey = None
                if (g.sharded or self.pbc_handlers or emitters
                        or u_pinject is not None):
                    rng, bkey, ekey = jax.random.split(
                        jax.random.fold_in(rng, step), 3)
                pends, disps = [], []
                oflags = [None] * len(sp_params)
                res_emits = res_obx = res_ores = None
                nsp = len(sp_params)

                def _sort_all_res(ss):
                    out = [PP3.brick_sort_p_home(
                               s, g, extent=sort_extents[k],
                               slack=res_slack)
                           for k, s in enumerate(ss)]
                    return (tuple(o[0] for o in out),
                            tuple(o[1] for o in out))

                if fused3 and residency_on:
                    # Per-brick bucketed residency (ops/residency): the
                    # layout is established ONCE (pre-push cond on the
                    # carried _res_valid flag, e.g. the very first step)
                    # and maintained incrementally by the post-push
                    # exchange/merge below; no per-step sort.  The whole
                    # path runs on static [0, E) extent slices: the dead
                    # capacity tail (headroom) never moves through HBM.
                    if nsp:
                        sp_full = list(species)
                        species = [RES.slice_species(s, res_exts[k])
                                   for k, s in enumerate(species)]
                        hh0 = tuple(diag[f"_chart_home{k}"]
                                    for k in range(nsp))
                        # collision cadences (static) shuffle lanes just
                        # above: rebucket on exactly those steps
                        relayout = diag["_res_valid"] == 0
                        for op in collision_ops:
                            if op.interval > 0:
                                relayout = relayout | (
                                    step % op.interval == 0)
                        species_t, homes_t = jax.lax.cond(
                            relayout,
                            lambda ss, hh: _sort_all_res(ss),
                            lambda ss, hh: (ss, hh),
                            tuple(species), hh0)
                        species = list(species_t)
                        for k in range(nsp):
                            diag[f"_chart_home{k}"] = homes_t[k]
                        homes = [diag[f"_chart_home{k}"]
                                 for k in range(nsp)]
                        (species, acc_T, oflags, _, res_emits, res_obx,
                         res_ores) = PP3.fused_push3d_multi(
                            species, tab_chart, acc_T, g,
                            [(spp.q, spp.m) for spp in sp_params],
                            max_streak=self.max_streak, homes=homes,
                            vbc_mark=vbc is not None,
                            residency=True, out_cap=RES.OUT_CAP,
                            dep_terms=self.pallas_deposit_terms)
                        species = list(species)
                elif fused3:
                    # STICKY home maps: the brick sort emits the exact
                    # block -> brick assignment of the layout it builds;
                    # it rides the jit-carried diag dict (checkpointed,
                    # scan-stable) until the next sort.  Re-deriving homes
                    # from drifted lane positions misassigns collectively-
                    # drifting blocks mid-sort-cycle and floods the
                    # outlier pass (measured ~150 ms/step at 256^2x64).
                    have_homes = "_chart_home0" in diag
                    nsp = len(sp_params)
                    if have_homes and sortK == 1:
                        for k in range(nsp):
                            species[k], diag[f"_chart_home{k}"] = \
                                PP3.brick_sort_p_home(
                                    species[k], g, extent=sort_extents[k])
                    elif have_homes and nsp:
                        # ONE cond for all species (a lax.cond costs
                        # ~28 us on this chip even inside a scan)
                        def _sort_all(ss, hh):
                            out = [PP3.brick_sort_p_home(
                                       s, g, extent=sort_extents[k])
                                   for k, s in enumerate(ss)]
                            return (tuple(o[0] for o in out),
                                    tuple(o[1] for o in out))
                        hh0 = tuple(diag[f"_chart_home{k}"]
                                    for k in range(nsp))
                        if sort_static is None:
                            species_t, homes_t = jax.lax.cond(
                                step % sortK == 0, _sort_all,
                                lambda ss, hh: (ss, hh),
                                tuple(species), hh0)
                        elif sort_static:
                            species_t, homes_t = _sort_all(
                                tuple(species), hh0)
                        else:
                            species_t, homes_t = tuple(species), hh0
                        species = list(species_t)
                        for k in range(nsp):
                            diag[f"_chart_home{k}"] = homes_t[k]
                    elif nsp:   # pre-home checkpoint: per-step fallback
                        _sort3 = lambda ss: tuple(
                            PP3.brick_sort_p(s, g, extent=sort_extents[k])
                            for k, s in enumerate(ss))
                        if sort_static is None:
                            species = list(jax.lax.cond(
                                step % sortK == 0, _sort3,
                                lambda ss: ss, tuple(species)))
                        elif sort_static:
                            species = list(_sort3(tuple(species)))
                    if sp_params:
                        homes = ([diag[f"_chart_home{k}"]
                                  for k in range(len(sp_params))]
                                 if have_homes else None)
                        # 2-D charts keep the historical 3-term deposit
                        # (their parity oracles -- e.g. the interior-
                        # absorber survivor-count match -- are exact-
                        # count tests tuned to better-than-f32 deposits);
                        # 3-D uses the knob (2-term measured ~4% faster
                        # at the 4M tier, drift-neutral)
                        species, acc_T, oflags, _ = PP3.fused_push3d_multi(
                            species, tab_chart, acc_T, g,
                            [(spp.q, spp.m) for spp in sp_params],
                            max_streak=self.max_streak, homes=homes,
                            vbc_mark=vbc is not None,
                            dep_terms=(self.pallas_deposit_terms
                                       if g.nz > 1 else 3))
                        species = list(species)
                else:
                    # ONE cond for every species' sort (a lax.cond costs
                    # ~28 us on this chip even inside a scanned step)
                    if sp_params:
                        _sort2 = lambda ss: tuple(PP.bucket_sort_p(
                            PP.remap_ghost_voxels(s, g), g, pack=1,
                            extent=sort_extents[k])
                            for k, s in enumerate(ss))
                        if sort_static is None:
                            species = list(jax.lax.cond(
                                step % sortK == 0, _sort2,
                                lambda ss: ss, tuple(species)))
                        elif sort_static:
                            species = list(_sort2(tuple(species)))
                    # ALL species through one kernel launch (species-pure
                    # blocks carry their own q/m via scalar prefetch):
                    # halves the call-fixed table-DMA + prep cost
                    if sp_params:
                        species, acc_T, oflags, _ = PP.fused_push_multi(
                            species, fcoef_T, acc_T, g,
                            [(spp.q, spp.m) for spp in sp_params],
                            max_streak=self.max_streak, window=window,
                            vbc_mark=vbc is not None,
                            dep_terms=self.pallas_deposit_terms)
                        species = list(species)
                remap3 = (lambda s: s) if fused3 else None
                if g.sharded:
                    for k, spp in enumerate(sp_params):
                        # remote/custom pends go to the deck-level
                        # boundary_p below (migration + edge BCs)
                        sp, acc_small, rhob, pend, disp = PP.outlier_pass(
                            species[k], oflags[k], fcoef_T, g, spp.q,
                            spp.m, acc_small, rhob, self.max_streak,
                            return_pends=True, remap_fn=remap3, vbc=vbc)
                        pends.append(pend)
                        disps.append(disp)
                        species[k] = sp
                elif sp_params:
                    # outlier lanes (stale sort / wall crossers) are rare:
                    # ONE joint cond gates every species' replay pass
                    # (per-species conds cost ~28 us each on this chip)
                    any_out = jnp.zeros((), bool)
                    for of in oflags:
                        any_out = any_out | jnp.any(of == 1)

                    def _outlier_all(c):
                        ss, acc_small, rhob, dg = c
                        ss = list(ss)
                        for k, spp in enumerate(sp_params):
                            okey = (jax.random.fold_in(bkey, k)
                                    if bkey is not None else None)
                            ss[k], acc_small, rhob, dg = PP.outlier_pass(
                                ss[k], oflags[k], fcoef_T, g, spp.q,
                                spp.m, acc_small, rhob, self.max_streak,
                                spp=spp, custom_handlers=self.pbc_handlers,
                                key=okey, remap_fn=remap3, diag=dg,
                                vbc=vbc, gate=False)
                        return tuple(ss), acc_small, rhob, dg
                    species_t, acc_small, rhob, diag = jax.lax.cond(
                        any_out, _outlier_all, lambda c: c,
                        (tuple(species), acc_small, rhob, diag))
                    species = list(species_t)
                if fused3 and residency_on and sp_params:
                    # --- residency exchange: route brick-leavers to
                    # their destination bricks and merge, or (overflow /
                    # capped leavers / misplaced outlier survivors) fall
                    # back to the full slack-padded brick sort.  Emitted
                    # lanes are still resident until the merge drops
                    # them, so the rebucket branch loses nothing. ---
                    homes = [diag[f"_chart_home{k}"] for k in range(nsp)]
                    free_j = RES.block_counts(species, res_emits)
                    homes_cat = (jnp.concatenate(homes) if nsp > 1
                                 else homes[0])
                    res_compact, starts_j, a_j, ovf, res_stats = \
                        RES.plan_exchange(
                            res_obx, homes_cat, res_spid, res_usable,
                            free_j, g)
                    mis = RES.any_misplaced(species, res_emits, homes, g)
                    trigger = ovf | (res_ores > 0) | mis
                    import os as _os
                    if _os.environ.get("VPIC_RES_DEBUG"):
                        if jax.devices()[0].platform == "tpu":
                            # tunnel has no host callbacks: latch the
                            # last step's trigger parts into diag
                            diag["_res_dbg"] = jnp.concatenate(
                                [jnp.stack(
                                    [ovf.astype(jnp.int32), res_ores,
                                     mis.astype(jnp.int32)]),
                                 res_stats])
                        else:
                            jax.debug.print(
                                "res dbg: ovf={} ores={} mis={}",
                                ovf, res_ores, mis)

                    def _rebucket(args):
                        ss, _ = args
                        return _sort_all_res(ss)

                    def _do_merge(args):
                        ss, hh = args
                        return (tuple(RES.merge_p(
                            ss, res_emits, res_compact, starts_j, a_j)),
                            hh)

                    species_t, homes_t = jax.lax.cond(
                        trigger, _rebucket, _do_merge,
                        (tuple(species), tuple(homes)))
                    species = [RES.join_species(sE, sF, res_exts[k])
                               for k, (sE, sF) in enumerate(
                                   zip(species_t, sp_full))]
                    for k in range(nsp):
                        diag[f"_chart_home{k}"] = homes_t[k]
                    diag["_res_valid"] = jnp.int32(1)
                    # cumulative fallback-sort count (perf observability:
                    # a healthy residency deck rebuckets rarely)
                    diag["_res_rebuckets"] = (
                        diag["_res_rebuckets"]
                        + trigger.astype(jnp.int32))
                # --- emission / user injection (advance.cc:58-60, before
                # boundary_p like the reference): runs on the standard-
                # layout accumulator/interpolator ---
                if emitters or u_pinject is not None:
                    fcoef = I.load_interpolator(f, g)
                    for em in emitters:
                        species, acc_small, rhob, ekey = em(
                            species, f, fcoef, acc_small, rhob, g, step,
                            ekey)
                    if u_pinject is not None:
                        species, acc_small, rhob, ekey = u_pinject(
                            species, f, fcoef, acc_small, rhob, g, step,
                            ekey)
                if g.sharded:
                    species, acc_small, rhob, _, diag = B.boundary_p(
                        species, sp_params, pends, disps, acc_small, rhob,
                        g, num_comm_round=self.num_comm_round,
                        max_streak=self.max_streak,
                        custom_handlers=self.pbc_handlers, key=bkey,
                        diag=diag, vbc=vbc)
                if fused3:
                    acc_T = PP3.fold_chart_acc(acc_T, g)
                acc_T = PP.fold_ghost_acc_T(acc_T, g)
                f = F.clear_jf(f)
                f = I.unload_accumulator_T(f, acc_T, g, extra=acc_small)
                f = F.synchronize_jf(f, g)
            else:
                # --- particle push + current deposition (XLA path) ---
                fcoef = I.load_interpolator(f, g)
                acc = jnp.zeros((g.nv, 12), jnp.float32)
                pends, disps = [], []
                for k, spp in enumerate(sp_params):
                    res = P.advance_p(species[k], fcoef, g, spp.q, spp.m,
                                      acc, rhob, max_streak=self.max_streak,
                                      vbc=vbc)
                    species[k] = res.species
                    acc = res.acc
                    rhob = res.rhob_flat
                    pends.append(res.pend_face)
                    disps.append(res.pend_disp)

                # --- emission / user injection (advance.cc:58-60) ---
                for em in emitters:
                    species, acc, rhob, rng = em(species, f, fcoef, acc,
                                                 rhob, g, step, rng)
                if u_pinject is not None:
                    species, acc, rhob, rng = u_pinject(
                        species, f, fcoef, acc, rhob, g, step, rng)

                # --- boundary interaction + cross-shard migration
                #     (boundary_p x num_comm_round, advance.cc:73-101) ---
                needs_boundary = (g.sharded or self.pbc_handlers or
                                  self._vbc is not None or
                                  any(bc <= -3 for bc in g.particle_bc))
                if needs_boundary:
                    rng, bkey = jax.random.split(
                        jax.random.fold_in(rng, step))
                    species, acc, rhob, _, diag = B.boundary_p(
                        species, sp_params, pends, disps, acc, rhob, g,
                        num_comm_round=self.num_comm_round,
                        max_streak=self.max_streak,
                        custom_handlers=self.pbc_handlers, key=bkey,
                        diag=diag, vbc=vbc)

                f = F.clear_jf(f)
                f = I.unload_accumulator(f, acc, g)
                f = F.synchronize_jf(f, g)
            f = f.replace(rhob=rhob.reshape(g.shape))

            if u_current is not None:
                f = u_current(f, step)

            # --- field advance ---
            f = F.advance_b(f, g, 0.5)
            f = F.advance_e(f, g, m, damp)
            if u_field is not None:
                f = u_field(f, step)
            f = F.advance_b(f, g, 0.5)

            # --- divergence cleaning (periodic) ---
            def clean_e(f):
                f = F.clear_rhof(f)
                rhof = f.rhof.reshape(-1)
                for k, spp in enumerate(sp_params):
                    spk = (PP.remap_ghost_voxels(species[k], g)
                           if use_fused else species[k])
                    rhof = P.accumulate_rho_p(rhof, spk, g, spp.q)
                f = f.replace(rhof=rhof.reshape(g.shape))
                f = F.synchronize_rho(f, g)
                for _ in range(self.num_div_e_round):
                    f = F.compute_div_e_err(f, g, m)
                    f = F.clean_div_e(f, g, m)
                return f

            def clean_b(f):
                for _ in range(self.num_div_b_round):
                    f = F.compute_div_b_err(f, g)
                    f = F.clean_div_b(f, g)
                return f

            ce = self.clean_div_e_interval
            cb = self.clean_div_b_interval
            sy = self.sync_shared_interval
            if ce > 0 and ce == cb == sy:
                # common deck idiom (all three on one cadence): ONE cond --
                # each lax.cond costs ~28 us on this chip even inside a
                # scanned step (measured; see trace_step.py)
                f = jax.lax.cond(
                    step % ce == 0,
                    lambda f: F.synchronize_tang_e_norm_b(
                        clean_b(clean_e(f)), g)[0],
                    lambda f: f, f)
            else:
                if ce > 0:
                    f = jax.lax.cond(step % ce == 0, clean_e,
                                     lambda f: f, f)
                if cb > 0:
                    f = jax.lax.cond(step % cb == 0, clean_b,
                                     lambda f: f, f)
                if sy > 0:
                    f = jax.lax.cond(
                        step % sy == 0,
                        lambda f: F.synchronize_tang_e_norm_b(f, g)[0],
                        lambda f: f, f)

            return state.replace(fields=f, species=tuple(species),
                                 step=step + 1, rng=rng,
                                 diag=diag if state.diag is not None
                                 else None)

        advance.uses_pallas = use_fused
        return advance

    def make_step(self) -> Callable[[SimState], SimState]:
        """The jitted full step: shard-local advance lifted over the device
        mesh when the grid is decomposed."""
        adv = self.make_advance()
        if not self.grid.sharded:
            return jax.jit(adv)
        from .parallel.mesh import make_mesh, shard_fn
        mesh = make_mesh(self.grid)
        return jax.jit(shard_fn(adv, self.grid, mesh))

    def make_multi_step(self, n_sub: int) -> Callable[[SimState], SimState]:
        """n_sub steps fused into ONE dispatch via lax.scan -- essential when
        host->device dispatch latency is high (remote/tunneled TPUs).

        NEGATIVE RESULT (round 4, measured): statically phasing the scan
        into [sort step + (sortK-1) sort-free steps] groups to remove the
        per-step step%sortK lax.cond benched 158.9 vs 164.4 M/s -- the
        cond's false branch is CHEAPER than the nested-scan group
        structure + duplicated step programs.  Do not retry blind; the
        make_advance(sort_static=) plumbing remains for kernel-phase work
        that needs static sort placement."""
        adv = self.make_advance()
        if self.grid.sharded:
            from .parallel.mesh import make_mesh, shard_fn
            adv = shard_fn(adv, self.grid, make_mesh(self.grid))

        def many(state):
            return jax.lax.scan(lambda c, _: (adv(c), None), state, None,
                                length=n_sub)[0]

        return jax.jit(many)

    def run(self, state: SimState = None, num_step: int = None,
            energies_file: str = None, checkpt_base: str = None,
            checkpt_interval: int = 0, quota_s: float = None,
            verbose: bool = True) -> SimState:
        """The main loop (deck/main.cc:121 `while(advance());`) with the
        standard diagnostics idioms: status printing + profile table at
        status_interval, energies appending, interval- or quota-based
        checkpointing (sample/harris:395-404)."""
        import time as _time
        from . import checkpoint as _ck
        from . import dump as _dump
        from .utils.profile import Profile

        if state is None:
            state = self.initialize()
        n = num_step if num_step is not None else self.num_step
        # chunk steps into single dispatches (scan) between diagnostics
        intervals = [v for v in (self.status_interval, checkpt_interval)
                     if v]
        # gcd so the chunked loop lands EXACTLY on every diagnostic step
        chunk = math.gcd(*intervals, 0) if intervals else min(max(n, 1), 100)
        step_fn = self.make_step()
        many_fn = self.make_multi_step(chunk) if chunk > 1 else step_fn
        prof = Profile()
        t0 = _time.time()
        if energies_file:
            _dump.dump_energies(self, state, energies_file, append=False)
        start = int(jnp.max(state.step))
        k = start
        while k < n:
            # align to the interval grid (restore may start mid-interval)
            todo = min(chunk - k % chunk, n - k)
            with prof.tic("advance", todo):
                state = many_fn(state) if todo == chunk else _run_singles(
                    step_fn, state, todo)
            k += todo
            if self.status_interval and k % self.status_interval == 0:
                jax.block_until_ready(state.fields.ex)
                if verbose:
                    print(f"Completed step {k} of {n}")
                    prof.update_profile()
                if energies_file:
                    with prof.tic("dump_energies"):
                        _dump.dump_energies(self, state, energies_file)
            if checkpt_base and checkpt_interval and \
                    k % checkpt_interval == 0:
                with prof.tic("checkpt"):
                    _ck.checkpt(state, checkpt_base, sim=self)
            if quota_s is not None and _time.time() - t0 > quota_s:
                if checkpt_base:
                    _ck.checkpt(state, checkpt_base, tag="quota", sim=self)
                break
        jax.block_until_ready(state.fields.ex)
        return state

    # ---------------- diagnostics ----------------

    def _energies_local(self, f, species):
        g = self.grid
        m = self._local_material_coeffs(self._material_coeffs())
        en_f = F.all_sum(F.energy_f(f, g, m), g)
        if not g.sharded:
            # fused-path states may hold particles in periodic ghost cells
            from .ops.pallas_push import remap_ghost_voxels
            species = [remap_ghost_voxels(sp, g) for sp in species]
        fcoef = I.load_interpolator(f, g)
        en_p = [F.all_sum(P.energy_p(sp, fcoef, g, st.params.q, st.params.m),
                          g)
                for st, sp in zip(self.species, species)]
        return jnp.concatenate([en_f, jnp.stack(en_p)]) if en_p else en_f

    def energies(self, state: SimState):
        """dump_energies columns (dump.cc:37-77):
        [ex, ey, ez, bx, by, bz, KE_sp0, KE_sp1, ...]"""
        g = self.grid
        fn = getattr(self, "_energies_jit", None)
        if fn is None:
            if not g.sharded:
                fn = jax.jit(lambda s: self._energies_local(s[0], s[1]))
            else:
                from .parallel.mesh import make_mesh, shard_reduce_fn
                mesh = make_mesh(g)
                fn = jax.jit(shard_reduce_fn(
                    lambda s: self._energies_local(s[0], s[1]), g, mesh))
            self._energies_jit = fn
        return fn((state.fields, state.species))
