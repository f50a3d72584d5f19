#!/usr/bin/env python
"""Field analysis tools: the numpy re-implementation of the reference's
MATLAB/IDL post-processing layer (interfaces/matlab/center_field.m,
smooth_field.m; interfaces/idl movie tooling; interfaces/c FFT utilities).

Pure numpy over the dicts produced by utilities.read_dumps (single-shard
readers or the multi-shard stitchers); no framework import needed.

Conventions: arrays are [z, y, x]-ordered interior meshes of shape
(nz, ny, nx) or staggered (n+1)-point meshes; grids are periodic for the
spectral tools (like the reference's, which assume a periodic brick).
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np


# ---------------------------------------------------------------------------
# Centering / smoothing (center_field.m, smooth_field.m)
# ---------------------------------------------------------------------------

def node_center(v, nx, ny, nz):
    """center_field.m (averaging method): move a quantity living on any of
    the grid's node/edge/face/cell meshes to NODES of the periodic
    (nx, ny, nz) grid by 2-point averaging along every axis whose extent is
    the cell count (i.e. the staggered axes).  ``v`` is [z, y, x]-ordered;
    periodic copies (n+1-sized axes) are dropped first."""
    v = np.asarray(v)
    # stagger flags BEFORE dropping periodic copies: an axis of extent n is
    # staggered (cell/edge/face mesh), n+1 is node-resident (center_field.m
    # keys the averaging off the ORIGINAL extents)
    st_z, st_y, st_x = (v.shape[0] == nz, v.shape[1] == ny,
                        v.shape[2] == nx)
    v = v[:nz, :ny, :nx]
    # average along staggered axes: value at node i = 0.5*(v[i-1] + v[i])
    if st_x:
        v = 0.5 * (np.roll(v, 1, axis=2) + v)
    if st_y:
        v = 0.5 * (np.roll(v, 1, axis=1) + v)
    if st_z:
        v = 0.5 * (np.roll(v, 1, axis=0) + v)
    return v


def fourier_smooth(v, dx, dy, dz, lambda_stop, lambda_pass):
    """smooth_field.m: remove wavelengths shorter than lambda_stop,
    preserve wavelengths longer than lambda_pass, linear |k|^2 roll-off
    between (hk = (ks2 - k2)/(ks2 - kp2), smooth_field.m:44-49).  Periodic
    interior mesh in, same shape out."""
    v = np.asarray(v, np.float64)
    nz, ny, nx = v.shape
    kx = 2 * np.pi * np.fft.fftfreq(nx) / dx
    ky = 2 * np.pi * np.fft.fftfreq(ny) / dy
    kz = 2 * np.pi * np.fft.fftfreq(nz) / dz
    mkz, mky, mkx = np.meshgrid(kz, ky, kx, indexing="ij")
    k2 = mkx ** 2 + mky ** 2 + mkz ** 2
    kp2 = (2 * np.pi / lambda_pass) ** 2
    ks2 = (2 * np.pi / lambda_stop) ** 2
    hk = np.where(k2 < kp2, 1.0,
                  np.where(k2 <= ks2, (ks2 - k2) / (ks2 - kp2), 0.0))
    return np.real(np.fft.ifftn(hk * np.fft.fftn(v)))


# ---------------------------------------------------------------------------
# Spectra (interfaces/c FFT utilities analogue)
# ---------------------------------------------------------------------------

def power_spectrum(v, dx=1.0, dy=1.0, dz=1.0):
    """|FFT|^2 of a periodic interior mesh with physical wavenumber axes.
    Returns (kz, ky, kx, P) with P the power (|F|^2 / N^2, so Parseval
    gives mean(v^2) = sum(P))."""
    v = np.asarray(v, np.float64)
    nz, ny, nx = v.shape
    F = np.fft.fftn(v) / v.size
    P = np.abs(F) ** 2
    kx = 2 * np.pi * np.fft.fftfreq(nx) / dx
    ky = 2 * np.pi * np.fft.fftfreq(ny) / dy
    kz = 2 * np.pi * np.fft.fftfreq(nz) / dz
    return kz, ky, kx, P


def radial_spectrum(v, dx=1.0, dy=1.0, dz=1.0, nbins=None):
    """Shell-averaged 1-D power spectrum P(|k|): the standard turbulence /
    filamentation diagnostic (what the reference decks compute offline
    from the C FFT joiners).  Returns (k_centers, P_shell)."""
    kz, ky, kx, P = power_spectrum(v, dx, dy, dz)
    mkz, mky, mkx = np.meshgrid(kz, ky, kx, indexing="ij")
    kmag = np.sqrt(mkx ** 2 + mky ** 2 + mkz ** 2).ravel()
    P = P.ravel()
    if nbins is None:
        nbins = max(8, min(v.shape) // 2)
    kmax = kmag.max() or 1.0
    idx = np.minimum((kmag / kmax * nbins).astype(int), nbins - 1)
    psum = np.bincount(idx, weights=P, minlength=nbins)
    k_centers = (np.arange(nbins) + 0.5) * kmax / nbins
    return k_centers, psum


# ---------------------------------------------------------------------------
# Dump-sequence tooling (movie.pro / batch_movie analogue)
# ---------------------------------------------------------------------------

def _seq(fbase):
    """Sorted (step, path) list for a dump series written as
    ``{fbase}.{step}`` (optionally with ``.{rank}`` shard suffixes --
    shard-0 files are returned; use read_dumps.stitch_* for full bricks)."""
    out = {}
    pat = re.compile(re.escape(os.path.basename(fbase))
                     + r"\.(\d+)(?:\.0)?$")
    for p in glob.glob(fbase + ".*"):
        m = pat.match(os.path.basename(p))
        if m:
            out[int(m.group(1))] = p
    return sorted(out.items())


def field_frames(fbase, component):
    """Load a time sequence of field dumps: returns (steps, frames) with
    frames[t] the [z,y,x] interior mesh of ``component`` at steps[t] --
    the data backbone of the reference's IDL movie tools (movie.pro)."""
    from . import read_dumps as RD
    steps, frames = [], []
    for step, path in _seq(fbase):
        meta, arrs = RD.read_fields(path)
        a = arrs[component]
        frames.append(a[1:-1, 1:-1, 1:-1] if a.ndim == 3 else a)
        steps.append(step)
    return np.asarray(steps), np.asarray(frames)


def probe_series(fbase, component, point):
    """Single-point time series of a dumped field component ((z,y,x)
    interior index), e.g. for growth-rate fits."""
    steps, frames = field_frames(fbase, component)
    z, y, x = point
    return steps, frames[:, z, y, x]
