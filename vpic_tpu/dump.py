"""Diagnostic dumps (src/vpic/dump.cc + dumpmacros.h).

Text dumps (energies, materials, species) and V0-format binary dumps
(fields, hydro, particles) compatible with the reference's layout
(WRITE_HEADER_V0, dumpmacros.h:7-41: binary-compat probe bytes, version,
dump type, step/grid metadata, rank/nproc, species id + q/m), so the
MATLAB/IDL/ParaView post-processors that read the reference's files can read
these.  Heavy binary blocks go through the native buffered writer
(csrc/io_writer.cpp) when built, with a pure-numpy fallback.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from .grid import Grid
from .ops import hydro as H
from .ops import interp as I
from .ops import push as P
from .native import io as native_io

DUMP_GRID = 0
DUMP_FIELDS = 1
DUMP_HYDRO = 2
DUMP_PARTICLES = 3


def _header_v0(g: Grid, step: int, dump_type: int, sp_id: int = -1,
               q_m: float = 0.0, rank: int = 0) -> bytes:
    h = struct.pack("<5b", 8, 2, 4, 4, 8)
    h += struct.pack("<h", 0xcafe - 0x10000)   # 0xcafe as int16
    h += struct.pack("<i", -0x21524111)        # 0xdeadbeef as int32
    h += struct.pack("<f", 1.0) + struct.pack("<d", 1.0)
    h += struct.pack("<2i", 0, dump_type)
    h += struct.pack("<i", int(step))
    h += struct.pack("<3i", g.nx, g.ny, g.nz)
    h += struct.pack("<4f", g.dt, g.dx, g.dy, g.dz)
    h += struct.pack("<3f", g.x0, g.y0, g.z0)
    h += struct.pack("<3f", g.cvac, g.eps0, 0.0)
    h += struct.pack("<2i", rank, g.n_shards)
    h += struct.pack("<i", sp_id) + struct.pack("<f", q_m)
    return h


def _array_header(elem_size: int, dims) -> bytes:
    return struct.pack("<2i", elem_size, len(dims)) + \
        struct.pack(f"<{len(dims)}i", *dims)


def dump_energies(sim, state, fname: str, append: bool = True):
    """dump_energies (dump.cc:37-77) text format."""
    en = np.asarray(sim.energies(state))
    step = int(np.asarray(state.step).max())
    mode = "a" if append else "w"
    with open(fname, mode) as fh:
        if not append:
            names = " ".join(f'"{st.params.name}"' for st in sim.species)
            fh.write(f"%% Layout\n%% step ex ey ez bx by bz {names}\n")
            fh.write(f"%% timestep = {sim.grid.dt:e}\n")
        fh.write(f"{step} " + " ".join(f"{v:e}" for v in en) + "\n")


def dump_materials(sim, fname: str):
    with open(fname, "w") as fh:
        fh.write("id name epsx epsy epsz mux muy muz "
                 "sigmax sigmay sigmaz zetax zetay zetaz\n")
        for m in sim.materials:
            fh.write(f"{m.id} {m.name} {m.epsx} {m.epsy} {m.epsz} "
                     f"{m.mux} {m.muy} {m.muz} {m.sigmax} {m.sigmay} "
                     f"{m.sigmaz} {m.zetax} {m.zetay} {m.zetaz}\n")


def dump_species(sim, fname: str):
    with open(fname, "w") as fh:
        fh.write("id name q m max_np sort_interval\n")
        for st in sim.species:
            p = st.params
            fh.write(f"{p.id} {p.name} {p.q} {p.m} {p.capacity} "
                     f"{p.sort_interval}\n")


def _shard_iter(g: Grid, arr):
    """Yield (rank, local ndarray) over shards (leading topology dims)."""
    if not g.sharded:
        yield 0, np.asarray(arr)
        return
    a = np.asarray(arr)
    rank = 0
    px, py, pz = g.topology
    for sx in range(px):
        for sy in range(py):
            for sz in range(pz):
                yield rank, a[sx, sy, sz]
                rank += 1


MAT_ID_ORDER = ("ematx", "ematy", "ematz", "nmat",
                "fmatx", "fmaty", "fmatz", "cmat")


def dump_fields(sim, state, fbase: str, ftag: Optional[int] = None):
    """field_dump (dump.cc:518+): V0 header + one interleaved field_t
    record per ghosted voxel: 16 floats + the 8 per-voxel material-id
    int16s (field_advance.h:152-160 member order) from the deck's
    stagger-class id meshes."""
    g = sim.grid
    step = int(np.asarray(state.step).max())
    tag = step if ftag is None else ftag
    f = state.fields
    comp_order = ("ex", "ey", "ez", "div_e_err", "cbx", "cby", "cbz",
                  "div_b_err", "tcax", "tcay", "tcaz", "rhob",
                  "jfx", "jfy", "jfz", "rhof")
    names = []
    for rank in range(g.n_shards):
        names.append(f"{fbase}.{tag}.{rank}")
    shard_arrays = {c: list(_shard_iter(g, getattr(f, c)))
                    for c in comp_order}
    mat_ids = getattr(sim, "_mat_ids", None)
    for rank in range(g.n_shards):
        rec = np.zeros((g.nv,), dtype=[("f", "<f4", (16,)),
                                       ("m", "<i2", (8,))])  # field_t
        for ci, c in enumerate(comp_order):
            rec["f"][:, ci] = shard_arrays[c][rank][1].reshape(-1)
        if mat_ids is not None:
            for mi, mc in enumerate(MAT_ID_ORDER):
                ids = mat_ids[mc]
                if ids.ndim == 6:          # sharded: topology-leading dims
                    ids = ids.reshape((g.n_shards,) + g.shape)[rank]
                rec["m"][:, mi] = ids.reshape(-1)
        hdr = _header_v0(g, step, DUMP_FIELDS, rank=rank)
        hdr += _array_header(80, [g.NX, g.NY, g.NZ])
        native_io.write_file(names[rank], hdr + rec.tobytes())
    return names


def _compute_hydro(sim, state, k, spp):
    """Interior hydro moments for species k.  Sharded states run the
    accumulate + ghost synchronization inside shard_map (the ppermute
    combine in synchronize_hydro needs the mesh axis names), returning
    topology-leading (px,py,pz, nv, N_HYDRO)."""
    import jax
    import jax.numpy as jnp
    g = sim.grid

    def _local(fs, sp):
        fcoef = I.load_interpolator(fs, g)
        h = jnp.zeros((g.nv, H.N_HYDRO), jnp.float32)
        h = H.accumulate_hydro_p(h, sp, fcoef, g, spp.q, spp.m)
        return H.synchronize_hydro(h, g)

    if not g.sharded:
        return _local(state.fields, state.species[k])
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS
    from .parallel.mesh import make_mesh
    mesh = make_mesh(g)
    spec = PS(*g.mesh_axes)

    def _shard(fs, sp):
        fs = jax.tree.map(lambda a: a[0, 0, 0], fs)
        sp = jax.tree.map(lambda a: a[0, 0, 0], sp)
        return _local(fs, sp)[None, None, None]

    return shard_map(_shard, mesh=mesh, in_specs=(spec, spec),
                     out_specs=spec)(state.fields, state.species[k])


def dump_hydro(sim, state, sp_name: str, fbase: str,
               ftag: Optional[int] = None):
    """hydro_dump (dump.cc): V0 header + 16-float hydro_t records."""
    g = sim.grid
    step = int(np.asarray(state.step).max())
    tag = step if ftag is None else ftag
    k = next(i for i, st in enumerate(sim.species)
             if st.params.name == sp_name)
    spp = sim.species[k].params
    hydro = _compute_hydro(sim, state, k, spp)

    names = []
    for rank, local in _shard_iter(g, hydro.reshape(g.shape + (H.N_HYDRO,))
                                   if not g.sharded else hydro):
        rec = np.zeros((g.nv, 16), np.float32)
        rec[:, :14] = np.asarray(local).reshape(g.nv, H.N_HYDRO)
        hdr = _header_v0(g, step, DUMP_HYDRO, sp_id=spp.id,
                         q_m=spp.q / spp.m, rank=rank)
        hdr += _array_header(64, [g.NX, g.NY, g.NZ])
        name = f"{fbase}.{tag}.{rank}"
        native_io.write_file(name, hdr + rec.astype("<f4").tobytes())
        names.append(name)
    return names


def dump_particles(sim, state, sp_name: str, fbase: str,
                   ftag: Optional[int] = None):
    """dump_particles (dump.cc:259-320): V0 header + 32-byte particle_t
    records with time-centered momenta (center_p before writing)."""
    g = sim.grid
    step = int(np.asarray(state.step).max())
    tag = step if ftag is None else ftag
    k = next(i for i, st in enumerate(sim.species)
             if st.params.name == sp_name)
    spp = sim.species[k].params

    def _centered(fs, s):
        # center_p is shard-local (local interpolator only, no collectives)
        fcoef = I.load_interpolator(fs, g)
        return P.center_p(s, fcoef, g, spp.q, spp.m)

    names = []
    rank = 0
    if not g.sharded:
        shards = [(0, _centered(state.fields, state.species[k]))]
    else:
        import jax
        shards = []
        px, py, pz = g.topology
        r = 0
        for sx in range(px):
            for sy in range(py):
                for sz in range(pz):
                    pick = lambda a: a[sx, sy, sz]
                    shards.append((r, _centered(
                        jax.tree.map(pick, state.fields),
                        jax.tree.map(pick, state.species[k]))))
                    r += 1
    for rank, lsp in shards:
        live = np.asarray(lsp.live)
        n = int(live.sum())
        rec = np.zeros(n, dtype=[("dx", "<f4"), ("dy", "<f4"), ("dz", "<f4"),
                                 ("i", "<i4"), ("ux", "<f4"), ("uy", "<f4"),
                                 ("uz", "<f4"), ("w", "<f4")])
        for nme in ("dx", "dy", "dz", "ux", "uy", "uz", "w"):
            rec[nme] = np.asarray(getattr(lsp, nme))[live]
        rec["i"] = np.asarray(lsp.i)[live]
        hdr = _header_v0(g, step, DUMP_PARTICLES, sp_id=spp.id,
                         q_m=spp.q / spp.m, rank=rank)
        hdr += _array_header(32, [n])
        name = f"{fbase}.{tag}.{rank}"
        native_io.write_file(name, hdr + rec.tobytes())
        names.append(name)
    return names


def dump_grid(sim, fbase: str):
    """dump_grid (dump.cc): binary grid metadata per rank (simplified: the
    V0 header carries the full grid geometry; bc and topology follow)."""
    g = sim.grid
    names = []
    for rank in range(g.n_shards):
        hdr = _header_v0(g, 0, DUMP_GRID, rank=rank)
        body = struct.pack("<6i", *g.field_bc)
        body += struct.pack("<6i", *g.particle_bc)
        body += struct.pack("<3i", *g.topology)
        name = f"{fbase}.{rank}"
        native_io.write_file(name, hdr + body)
        names.append(name)
    return names


# ---------------- new-style banded dumps (field_dump/hydro_dump with
# strides + global header, dump.cc:518+ / dumpmacros.h:43-64) ----------------

FIELD_BANDS = ("ex", "ey", "ez", "div_e_err", "cbx", "cby", "cbz",
               "div_b_err", "tcax", "tcay", "tcaz", "rhob",
               "jfx", "jfy", "jfz", "rhof")


def dump_fields_strided(sim, state, fbase: str, stride=(1, 1, 1),
                        components=None, ftag: Optional[int] = None):
    """New-style stride-subsampled band-sequential field dump (the
    "dumpParams" field_dump path, dump.cc:518-660): per-rank binary of the
    selected component bands subsampled over interior voxels
    [1 : n+1 : stride], plus ONE ``{fbase}.{tag}.global`` text header
    (the multi-file global header the ParaView/Ensight readers consume)
    recording topology, strides, band order, and per-rank file names."""
    g = sim.grid
    step = int(np.asarray(state.step).max())
    tag = step if ftag is None else ftag
    comps = list(components) if components is not None else list(FIELD_BANDS)
    sx, sy, sz = (int(v) for v in stride)
    names = []
    for c in comps:
        if c not in FIELD_BANDS:
            raise ValueError(f"unknown field component {c!r}")
    shard_arrays = {c: list(_shard_iter(g, getattr(state.fields, c)))
                    for c in comps}
    shp = None
    for rank in range(g.n_shards):
        bands = []
        for c in comps:
            a = shard_arrays[c][rank][1][1:g.nz + 1:sz,
                                         1:g.ny + 1:sy,
                                         1:g.nx + 1:sx]
            shp = a.shape
            bands.append(np.ascontiguousarray(a, "<f4"))
        hdr = _header_v0(g, step, DUMP_FIELDS, rank=rank)
        hdr += _array_header(4 * len(comps), [shp[2], shp[1], shp[0]])
        name = f"{fbase}.{tag}.{rank}"
        native_io.write_file(name, hdr + b"".join(b.tobytes() for b in bands))
        names.append(name)
    with open(f"{fbase}.{tag}.global", "w") as fh:
        fh.write(f"step {step}\n")
        fh.write(f"grid {g.nx * g.topology[0]} {g.ny * g.topology[1]} "
                 f"{g.nz * g.topology[2]}\n")
        fh.write(f"topology {g.topology[0]} {g.topology[1]} "
                 f"{g.topology[2]}\n")
        fh.write(f"stride {sx} {sy} {sz}\n")
        fh.write(f"local_dims {shp[2]} {shp[1]} {shp[0]}\n")
        fh.write("bands " + " ".join(comps) + "\n")
        fh.write("files " + " ".join(names) + "\n")
    return names


def dump_hydro_strided(sim, state, sp_name: str, fbase: str,
                       stride=(1, 1, 1), ftag: Optional[int] = None):
    """New-style stride-subsampled band-sequential hydro dump (hydro_dump
    with dumpParams, dump.cc:662+); bands are the 14 hydro moments."""
    g = sim.grid
    step = int(np.asarray(state.step).max())
    tag = step if ftag is None else ftag
    k = next(i for i, st in enumerate(sim.species)
             if st.params.name == sp_name)
    spp = sim.species[k].params
    hydro = _compute_hydro(sim, state, k, spp)
    sx, sy, sz = (int(v) for v in stride)
    names = []
    shp = None
    for rank, local in _shard_iter(g, hydro.reshape(g.shape + (H.N_HYDRO,))
                                   if not g.sharded else hydro):
        a = np.asarray(local).reshape(g.NZ, g.NY, g.NX, H.N_HYDRO)
        a = a[1:g.nz + 1:sz, 1:g.ny + 1:sy, 1:g.nx + 1:sx]
        shp = a.shape[:3]
        bands = np.ascontiguousarray(np.moveaxis(a, 3, 0), "<f4")
        hdr = _header_v0(g, step, DUMP_HYDRO, sp_id=spp.id,
                         q_m=spp.q / spp.m, rank=rank)
        hdr += _array_header(4 * H.N_HYDRO, [shp[2], shp[1], shp[0]])
        name = f"{fbase}.{tag}.{rank}"
        native_io.write_file(name, hdr + bands.tobytes())
        names.append(name)
    with open(f"{fbase}.{tag}.global", "w") as fh:
        fh.write(f"step {step}\nspecies {sp_name}\n")
        fh.write(f"topology {g.topology[0]} {g.topology[1]} "
                 f"{g.topology[2]}\n")
        fh.write(f"stride {sx} {sy} {sz}\n")
        fh.write(f"local_dims {shp[2]} {shp[1]} {shp[0]}\n")
        fh.write(f"bands {H.N_HYDRO}\n")
        fh.write("files " + " ".join(names) + "\n")
    return names
