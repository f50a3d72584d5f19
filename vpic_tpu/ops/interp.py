"""Field <-> particle interface arrays.

Re-design of src/sf_interface/:

* ``load_interpolator``  <- interpolator_array_pipeline.cc:21-126.  Produces a
  flat (nv, 18) coefficient table (rows indexed by voxel) so the particle push
  gathers one contiguous 72-byte row per particle.
* ``unload_accumulator`` <- unload_accumulator_pipeline.cc:17-137.  Folds the
  (nv, 12) quarter-face current accumulator into the Yee-edge jf fields.
  The reference's (1 + n_pipeline) accumulator replicas + deterministic tree
  reduction (sf_interface.h:107-158, reduce_accumulators) are unnecessary
  here: deposition uses XLA's deterministic scatter-add into a single
  accumulator (see ops/push.py), so clear = jnp.zeros and reduce = identity.

Coefficient row layout (matches interpolator_t, sf_interface.h:62-80):
  0 ex        1 dexdy    2 dexdz    3 d2exdydz
  4 ey        5 deydz    6 deydx    7 d2eydzdx
  8 ez        9 dezdx   10 dezdy   11 d2ezdxdy
 12 cbx      13 dcbxdx  14 cby     15 dcbydy   16 cbz  17 dcbzdz

Accumulator column layout (matches accumulator_t, sf_interface.h:115-131):
  jx[0..3], jy[0..3], jz[0..3] quarter-face currents.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..grid import Grid
from ..state import FieldState
from .fields import HI, INT, INTH, LO, LOH, _sl3, _sladd

FOURTH = 0.25
HALF = 0.5


def _interp_comb_matrix():
    """(18, 42) constant combination matrix for the batched interpolator
    build: row k dots the (7 shifts x 6 fields) slice stack into
    coefficient k.  Shift order: 0, +x, +y, +z, +xy, +xz, +yz; column
    index = shift * 6 + field (ex ey ez cbx cby cbz).  numpy only (no
    backend touch at import)."""
    import numpy as np
    C = np.zeros((18, 42), np.float32)
    ax_shift = {0: 1, 1: 2, 2: 3}              # grid axis -> shift index
    both_shift = {(1, 2): 6, (2, 0): 5, (0, 1): 4}
    row = 0
    for fi, ax1, ax2 in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        s0, s1 = 0, ax_shift[ax1]
        s2 = ax_shift[ax2]
        s3 = both_shift[(ax1, ax2)]
        col = lambda s: s * 6 + fi
        # (w3+w0)+(w1+w2), (w3-w0)+(w1-w2), (w3-w0)-(w1-w2), (w3+w0)-(w1+w2)
        for signs in ((1, 1, 1, 1), (-1, 1, 1, -1),
                      (-1, 1, -1, 1), (1, 1, -1, -1)):
            for s, sg in zip((s0, s3, s1, s2), signs):
                C[row, col(s)] = FOURTH * sg
            row += 1
    for fi, ax in ((3, 0), (4, 1), (5, 2)):
        col = lambda s: s * 6 + fi
        C[row, col(0)] = HALF
        C[row, col(ax_shift[ax])] = HALF
        row += 1
        C[row, col(0)] = -HALF
        C[row, col(ax_shift[ax])] = HALF
        row += 1
    assert row == 18
    return C


def load_interpolator(f: FieldState, g: Grid):
    """Build the (nv, 18) interpolation-coefficient table.

    E components use a bilinear fit in their two transverse directions
    (value, two slopes, one cross term); B components a linear fit along
    their own axis -- exactly the reference's stencil.
    """
    coeffs = jnp.zeros((g.NZ, g.NY, g.NX, 18), jnp.float32)
    t = _sl3(INT, INT, INT)            # voxel (x, y, z), interior

    def quads(a, ax1, ax2):
        """w0=a(t), w1=a(+ax1), w2=a(+ax2), w3=a(+ax1+ax2)."""
        sl1 = [INT, INT, INT]
        sl1[2 - ax1] = HI
        sl2 = [INT, INT, INT]
        sl2[2 - ax2] = HI
        sl3_ = [INT, INT, INT]
        sl3_[2 - ax1] = HI
        sl3_[2 - ax2] = HI
        w0 = a[t]
        w1 = a[tuple(sl1)]
        w2 = a[tuple(sl2)]
        w3 = a[tuple(sl3_)]
        return (FOURTH * ((w3 + w0) + (w1 + w2)),
                FOURTH * ((w3 - w0) + (w1 - w2)),
                FOURTH * ((w3 - w0) - (w1 - w2)),
                FOURTH * ((w3 + w0) - (w1 + w2)))

    def lin(a, ax):
        sl1 = [INT, INT, INT]
        sl1[2 - ax] = HI
        w0 = a[t]
        w1 = a[tuple(sl1)]
        return HALF * (w1 + w0), HALF * (w1 - w0)

    ex, dexdy, dexdz, d2exdydz = quads(f.ex, 1, 2)
    ey, deydz, deydx, d2eydzdx = quads(f.ey, 2, 0)
    ez, dezdx, dezdy, d2ezdxdy = quads(f.ez, 0, 1)
    cbx, dcbxdx = lin(f.cbx, 0)
    cby, dcbydy = lin(f.cby, 1)
    cbz, dcbzdz = lin(f.cbz, 2)

    stacked = jnp.stack([ex, dexdy, dexdz, d2exdydz,
                         ey, deydz, deydx, d2eydzdx,
                         ez, dezdx, dezdy, d2ezdxdy,
                         cbx, dcbxdx, cby, dcbydy, cbz, dcbzdz], axis=-1)
    coeffs = coeffs.at[INT, INT, INT, :].set(stacked)
    return coeffs.reshape(g.nv, 18)


def load_interpolator_T(f: FieldState, g: Grid, nvp: int, mark=None,
                        y_images: bool = True):
    """Transposed-layout coefficient table (24, nvp; rows 0-17 used) for the
    fused Pallas
    push: voxel index on the TPU lane dimension; built directly (component-
    major stack of flattened planes) so no on-device transpose is needed.

    ``mark`` optionally is an interior (nz, ny, nx) 0/1 mask of cells with
    per-voxel custom particle-BC faces; it rides spare row 18 (ghost-
    expanded like the field rows) so the fused kernel gets the flag from
    the same one-hot gather.

    BATCHED build: this runs EVERY step, and the per-component form (18
    components x slices/arith/concats on tiny (nz,ny,nx) planes) lowered
    to ~200 dispatch-bound XLA ops costing 0.82 ms/step at 64^2 -- more
    than the deposit matmuls of the push itself.  Instead: ONE stack of
    the six field arrays, SEVEN shifted slices of the stacked tensor, and
    one constant (18, 42) HIGHEST-precision matmul emits every
    coefficient plane at once; the ghost expansion is applied to the
    whole (18[+1], nz, ny, nx) stack in <= 3 concats."""
    # padded to 24 rows (18 used): DMA slices need 8-sublane alignment
    F = jnp.stack([f.ex, f.ey, f.ez, f.cbx, f.cby, f.cbz])  # (6,NZ,NY,NX)
    NZ, NY, NX = g.NZ, g.NY, g.NX
    # interior slice shifted by (sx, sy, sz) in grid axes (array axes
    # reversed); shift-major x field-major stack -> S row s*6 + fi
    shifts = ((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
              (1, 1, 0), (1, 0, 1), (0, 1, 1))
    Ss = [jax.lax.slice(F, (0, 1 + sz, 1 + sy, 1 + sx),
                        (6, NZ - 1 + sz, NY - 1 + sy, NX - 1 + sx))
          for (sx, sy, sz) in shifts]
    S = jnp.stack(Ss).reshape(42, -1)          # (42, nz*ny*nx)
    C = _interp_comb_matrix()                  # (18, 42) constant
    comps18 = jnp.dot(C, S, precision=jax.lax.Precision.HIGHEST)
    nz, ny, nx = NZ - 2, NY - 2, NX - 2
    full = comps18.reshape(18, nz, ny, nx)
    if mark is not None:
        full = jnp.concatenate(
            [full, jnp.asarray(mark, jnp.float32)[None]], axis=0)
    # Add ghost layers per axis: periodic axes WRAP (so the fused push can
    # let particles *reside* in ghost cells between sorts; their deposits
    # are folded back by fold_ghost_acc_T), others zero.
    from ..grid import P_PERIODIC
    from .pallas_push import _eff_bc
    periodic = [_eff_bc(g, ax, -1) == P_PERIODIC for ax in (0, 1, 2)]
    for ax in (0, 1, 2):            # grid x, y, z -> array axes 3, 2, 1
        aa = 3 - ax
        if periodic[ax]:
            lo = jax.lax.slice_in_dim(full, full.shape[aa] - 1,
                                      full.shape[aa], axis=aa)
            hi = jax.lax.slice_in_dim(full, 0, 1, axis=aa)
            full = jnp.concatenate([lo, full, hi], axis=aa)
        else:
            pw = [(0, 0)] * 4
            pw[aa] = (1, 1)
            full = jnp.pad(full, pw)
    flat = full.reshape(full.shape[0], g.nv)
    if mark is not None:
        flat = jnp.concatenate(
            [flat[:18], jnp.zeros((6, g.nv), flat.dtype)
             .at[0].set(flat[18])], axis=0)
        out = jnp.pad(flat, ((0, 0), (0, nvp - g.nv)))
    else:
        out = jnp.pad(flat, ((0, 6), (0, nvp - g.nv)))
    if g.nz == 1 and periodic[1] and y_images:
        # Unwrapped-y scheme (see ops/pallas_push.py): the z=0 / z=2 plane
        # thirds hold periodic y-image copies of the z=1 plane so walks can
        # continue past the y ghost layer without leaving the window.
        from .pallas_push import expand_y_images_T
        out = expand_y_images_T(out, g)
    return out


def unload_accumulator_T(f: FieldState, acc_T, g: Grid,
                         extra=None) -> FieldState:
    """unload_accumulator for the transposed (12, nvp) accumulator layout
    (no transpose back needed); ``extra`` optionally adds a standard-layout
    (nv, 12) accumulator (the fused path's outlier contributions)."""
    a = acc_T[:12, :g.nv].reshape(12, g.NZ, g.NY, g.NX)
    e = extra.reshape(g.NZ, g.NY, g.NX, 12) if extra is not None else None
    cx = 0.25 * g.rdy * g.rdz / g.dt
    cy = 0.25 * g.rdz * g.rdx / g.dt
    cz = 0.25 * g.rdx * g.rdy / g.dt
    t = _sl3(INTH, INTH, INTH)

    def fold(col0, c, ax1, ax2):
        s0 = list(t)
        s1 = list(t)
        s1[2 - ax1] = LOH
        s2 = list(t)
        s2[2 - ax2] = LOH
        s3 = list(t)
        s3[2 - ax1] = LOH
        s3[2 - ax2] = LOH
        total = (a[(col0,) + tuple(s0)] + a[(col0 + 1,) + tuple(s1)]
                 + a[(col0 + 2,) + tuple(s2)] + a[(col0 + 3,) + tuple(s3)])
        if e is not None:
            total = total + (e[tuple(s0) + (col0,)]
                             + e[tuple(s1) + (col0 + 1,)]
                             + e[tuple(s2) + (col0 + 2,)]
                             + e[tuple(s3) + (col0 + 3,)])
        return c * total

    jfx = _sladd(f.jfx, t, fold(0, cx, 1, 2))
    jfy = _sladd(f.jfy, t, fold(4, cy, 2, 0))
    jfz = _sladd(f.jfz, t, fold(8, cz, 0, 1))
    return f.replace(jfx=jfx, jfy=jfy, jfz=jfz)


def unload_accumulator(f: FieldState, acc, g: Grid) -> FieldState:
    """acc (nv, 12) quarter-face currents -> jf Yee-edge currents.

    jfx(x,y,z) += cx*( a(x,y,z).jx0 + a(x,y-1,z).jx1 + a(x,y,z-1).jx2
                       + a(x,y-1,z-1).jx3 )   over x,y,z in 1..n+1
    with cx = 0.25*rdy*rdz/dt (cyclic for y,z).  Ghost accumulator rows are
    zero by construction (particles only ever occupy interior voxels).
    """
    a = acc.reshape(g.NZ, g.NY, g.NX, 12)
    cx = 0.25 * g.rdy * g.rdz / g.dt
    cy = 0.25 * g.rdz * g.rdx / g.dt
    cz = 0.25 * g.rdx * g.rdy / g.dt

    t = _sl3(INTH, INTH, INTH)

    def fold(col0, c, ax1, ax2):
        """col0..col0+3 columns combined at offsets (0,0), (-ax1), (-ax2),
        (-ax1-ax2)."""
        s0 = list(t)
        s1 = list(t)
        s1[2 - ax1] = LOH
        s2 = list(t)
        s2[2 - ax2] = LOH
        s3 = list(t)
        s3[2 - ax1] = LOH
        s3[2 - ax2] = LOH
        return c * (a[tuple(s0) + (col0,)] + a[tuple(s1) + (col0 + 1,)]
                    + a[tuple(s2) + (col0 + 2,)] + a[tuple(s3) + (col0 + 3,)])

    jfx = _sladd(f.jfx, t, fold(0, cx, 1, 2))
    jfy = _sladd(f.jfy, t, fold(4, cy, 2, 0))
    jfz = _sladd(f.jfz, t, fold(8, cz, 0, 1))
    return f.replace(jfx=jfx, jfy=jfy, jfz=jfz)
