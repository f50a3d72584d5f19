"""EXPERIMENTAL fused field phase: one Pallas kernel for everything between
the particle push and the next step's gather table.

Status: exact in interpreter mode (tests) and kept as the staging ground for
round-2 field-phase fusion; the current Mosaic toolchain crashes compiling
the full mega-kernel on hardware, so the deck does NOT wire it in yet.

On the tunneled TPU each XLA kernel launch costs ~25us and the per-step
field phase (accumulator fold + unload + jf sync + advance_b/e/b + ghost
fills + interpolator build) lowers to ~150 small kernels over ~2 MB of
mesh data.  Since every op in ops/fields.py and ops/interp.py is pure jnp
slice arithmetic on static shapes, the entire phase can run INSIDE one
Pallas kernel on VMEM-resident values -- the same functions are reused
verbatim (values, not refs), so there is no duplicated numerics to drift.

Scope: unsharded grids with scalar (single-material) coefficients; the
general path runs otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid
from ..state import FieldState, MaterialCoeffs
from . import fields as F
from . import interp as I
from .pallas_push import _round_up, fold_ghost_acc_T

_COMPS = ("ex", "ey", "ez", "cbx", "cby", "cbz", "tcax", "tcay", "tcaz",
          "jfx", "jfy", "jfz", "rhof", "rhob", "div_e_err", "div_b_err")


def supports(g: Grid, m: MaterialCoeffs) -> bool:
    if g.sharded:
        return False
    # scalar coefficients only (uniform material)
    return all(getattr(m, f.name).ndim == 0
               for f in MaterialCoeffs.__dataclass_fields__.values())


def _phase(g: Grid, m: MaterialCoeffs, damp: float, nvp: int, f: FieldState,
           acc_T, acc_small):
    """The pure-jnp field phase (identical to the deck's general sequence)."""
    acc_T = fold_ghost_acc_T(acc_T, g)
    f = F.clear_jf(f)
    f = I.unload_accumulator_T(f, acc_T, g, extra=acc_small)
    f = F.synchronize_jf(f, g)
    f = F.advance_b(f, g, 0.5)
    f = F.advance_e(f, g, m, damp)
    f = F.advance_b(f, g, 0.5)
    fcoef_T = I.load_interpolator_T(f, g, nvp)
    return f, fcoef_T


def _kernel(g, m, damp, nvp, acc_T_ref, acc_small_ref, *refs):
    n = len(_COMPS)
    in_refs = refs[:n]
    out_refs = refs[n:n + n]
    fcoef_ref = refs[n + n]
    f = FieldState(**{c: in_refs[k][:] for k, c in enumerate(_COMPS)})
    f, fcoef_T = _phase(g, m, damp, nvp, f, acc_T_ref[:], acc_small_ref[:])
    for k, c in enumerate(_COMPS):
        out_refs[k][:] = getattr(f, c)
    fcoef_ref[:] = fcoef_T


@functools.partial(jax.jit, static_argnames=("g", "m_vals", "damp", "nvp"))
def field_phase(f: FieldState, acc_T, acc_small, g: Grid, m_vals: tuple,
                damp: float, nvp: int):
    """Returns (fields', fcoef_T) after the full post-push field phase.
    ``m_vals`` is the static tuple of the 13 scalar material coefficients."""
    interpret = jax.devices()[0].platform != "tpu"
    m = MaterialCoeffs(*[float(v) for v in m_vals])
    kernel = functools.partial(_kernel, g, m, damp, nvp)
    out_shape = ([jax.ShapeDtypeStruct(g.shape, jnp.float32)] * len(_COMPS)
                 + [jax.ShapeDtypeStruct((18, nvp), jnp.float32)])
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        interpret=interpret,
    )(acc_T, acc_small, *[getattr(f, c) for c in _COMPS])
    new_f = FieldState(**{c: outs[k] for k, c in enumerate(_COMPS)})
    return new_f, outs[-1]
