#!/usr/bin/env python
"""Prototype: the advance_b/advance_e/advance_b field trio as ONE Pallas
kernel, calling the EXISTING ops/fields.py stencils inside the kernel body
(slset was written to lower under Mosaic).  Round-1's whole-field-phase
kernel crashed Mosaic; this re-tests the toolchain on the minimal slice
and benchmarks kernel-vs-XLA on a 64^2 harris grid.

Usage: field_fuse_proto.py [--cpu]   (--cpu: interpret-mode parity only)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vpic_tpu.models import harris
from vpic_tpu.ops import fields as F

_FLD = ("ex", "ey", "ez", "cbx", "cby", "cbz",
        "tcax", "tcay", "tcaz", "jfx", "jfy", "jfz")
_OUT = _FLD[:9]


def beb_xla(f, g, m, damp):
    f = F.advance_b(f, g, 0.5)
    f = F.advance_e(f, g, m, damp)
    f = F.advance_b(f, g, 0.5)
    return f


def make_beb_kernel(g, m, damp, f0):
    def kernel(*refs):
        ins = refs[:12]
        outs = refs[12:]
        f = f0.replace(**{n: ins[k][:, :, :] for k, n in enumerate(_FLD)})
        f = beb_xla(f, g, m, damp)
        for k, n in enumerate(_OUT):
            outs[k][:, :, :] = getattr(f, n)

    shapes = [jax.ShapeDtypeStruct(getattr(f0, n).shape, jnp.float32)
              for n in _OUT]

    def run(f):
        outs = pl.pallas_call(
            kernel,
            out_shape=shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            interpret=jax.devices()[0].platform != "tpu",
        )(*[getattr(f, n) for n in _FLD])
        return f.replace(**{n: outs[k] for k, n in enumerate(_OUT)})

    return run


def main():
    sim = harris.build(harris.HarrisParams(nx=64, ny=64, nppc=4))
    state = sim.initialize()
    g = sim.grid
    import dataclasses
    m = sim._local_material_coeffs(sim._material_coeffs())
    # scalar (vacuum) coefficients must be python floats so the kernel
    # closes over literals, not traced constants
    m = dataclasses.replace(m, **{
        fld.name: float(getattr(m, fld.name))
        for fld in dataclasses.fields(m)
        if getattr(getattr(m, fld.name), "ndim", 0) == 0})
    damp = sim.damp
    f0 = state.fields

    fused = make_beb_kernel(g, m, damp, f0)
    ref = jax.jit(lambda f: beb_xla(f, g, m, damp))
    out_ref = ref(f0)
    out_fused = jax.jit(fused)(f0)
    import numpy as np
    worst = 0.0
    for n in _OUT:
        d = float(jnp.abs(getattr(out_ref, n) - getattr(out_fused, n)).max())
        worst = max(worst, d)
    print(f"parity: max |xla - fused| = {worst:.3e}")
    assert worst < 1e-6, "MISMATCH"

    if CPU:
        print("cpu interpret parity OK")
        return

    def scan_time(step, label):
        run = jax.jit(lambda f: jax.lax.scan(
            lambda c, _: (step(c), None), f, None, length=100)[0])
        out = run(f0)
        jax.block_until_ready(out.ex)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(out)
            jax.block_until_ready(out.ex)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:22s} {best*1e3/100:7.3f} ms/step", flush=True)

    scan_time(ref, "XLA b/e/b")
    scan_time(fused, "Pallas fused b/e/b")


if __name__ == "__main__":
    main()
