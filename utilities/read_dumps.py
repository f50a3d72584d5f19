#!/usr/bin/env python
"""Post-processing reader for the V0-format binary dumps written by
vpic_tpu.dump (the analogue of the reference's MATLAB/IDL loaders,
interfaces/matlab/*.m).  Pure numpy; no framework import needed."""

import struct
import sys

import numpy as np

HEADER_FMT = "<5bhifd2i i 3i 4f 3f 3f 2i i f"


def read_header(fh):
    raw = fh.read(struct.calcsize(HEADER_FMT))
    vals = struct.unpack(HEADER_FMT, raw)
    (cb, ss, si, sf, sd, magic16, magic32, f1, d1, version, dump_type,
     step, nx, ny, nz, dt, dx, dy, dz, x0, y0, z0, cvac, eps0, damp,
     rank, nproc, sp_id, q_m) = vals
    assert magic16 == 0xcafe - 0x10000 and magic32 == -0x21524111, \
        "not a V0 dump"
    return dict(version=version, dump_type=dump_type, step=step,
                nx=nx, ny=ny, nz=nz, dt=dt, dx=dx, dy=dy, dz=dz,
                x0=x0, y0=y0, z0=z0, cvac=cvac, eps0=eps0,
                rank=rank, nproc=nproc, sp_id=sp_id, q_m=q_m)


def read_array_header(fh):
    esize, ndim = struct.unpack("<2i", fh.read(8))
    dims = struct.unpack(f"<{ndim}i", fh.read(4 * ndim))
    return esize, dims


FIELD_NAMES = ("ex", "ey", "ez", "div_e_err", "cbx", "cby", "cbz",
               "div_b_err", "tcax", "tcay", "tcaz", "rhob",
               "jfx", "jfy", "jfz", "rhof")
MAT_NAMES = ("ematx", "ematy", "ematz", "nmat",
             "fmatx", "fmaty", "fmatz", "cmat")
HYDRO_NAMES = ("jx", "jy", "jz", "rho", "px", "py", "pz", "ke",
               "txx", "tyy", "tzz", "tyz", "tzx", "txy", "pad0", "pad1")


def read_fields(path):
    with open(path, "rb") as fh:
        hdr = read_header(fh)
        esize, dims = read_array_header(fh)
        n = dims[0] * dims[1] * dims[2]
        # field_t: 16 floats + 8 material-id int16s per voxel
        rec = np.frombuffer(fh.read(n * 80),
                            dtype=[("f", "<f4", (16,)), ("m", "<i2", (8,))])
        out = {name: rec["f"][:, c].reshape(dims[2], dims[1], dims[0])
               for c, name in enumerate(FIELD_NAMES)}
        out.update({name: rec["m"][:, c].reshape(dims[2], dims[1], dims[0])
                    for c, name in enumerate(MAT_NAMES)})
        return hdr, out


def read_hydro(path):
    with open(path, "rb") as fh:
        hdr = read_header(fh)
        esize, dims = read_array_header(fh)
        n = dims[0] * dims[1] * dims[2]
        rec = np.frombuffer(fh.read(n * 64), "<f4").reshape(n, 16)
        out = {name: rec[:, c].reshape(dims[2], dims[1], dims[0])
               for c, name in enumerate(HYDRO_NAMES[:14])}
        return hdr, out


def read_particles(path):
    with open(path, "rb") as fh:
        hdr = read_header(fh)
        esize, dims = read_array_header(fh)
        dtype = np.dtype([("dx", "<f4"), ("dy", "<f4"), ("dz", "<f4"),
                          ("i", "<i4"), ("ux", "<f4"), ("uy", "<f4"),
                          ("uz", "<f4"), ("w", "<f4")])
        rec = np.frombuffer(fh.read(dims[0] * esize), dtype)
        return hdr, rec


if __name__ == "__main__":
    path = sys.argv[1]
    hdr, _ = read_fields(path)
    print(hdr)
