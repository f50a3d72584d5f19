#!/usr/bin/env python
"""Trace the ablated fused-push scan and print per-op cost (dev tool)."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from vpic_tpu.models import harris
from vpic_tpu.ops import interp as I
from vpic_tpu.ops import pallas_push as PP


def main():
    ablate = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n = 50
    p = harris.HarrisParams(nx=64, ny=64, nppc=64)
    sim = harris.build(p)
    state = sim.initialize()
    g = sim.grid
    spp = sim.species[0].params
    nvp = PP.table_width(g)
    fcoef_T = jax.jit(lambda f: I.load_interpolator_T(f, g, nvp))(
        state.fields)
    sp_s = jax.jit(lambda s: PP.bucket_sort_p(
        PP.remap_ghost_voxels(s, g), g))(state.species[0])
    acc_T0 = jnp.zeros((16, nvp), jnp.float32)

    def body(c, _):
        sp, acc = c
        sp2, acc2, oflag, oow = PP.fused_push(
            sp, fcoef_T, acc, g, spp.q, spp.m, ablate=ablate)
        return (sp2, acc2), None

    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])
    out = f((sp_s, acc_T0))
    jax.block_until_ready(out[1])

    logdir = "/tmp/vpic_trace_ab"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = f((sp_s, acc_T0))
        jax.block_until_ready(out[1])

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(paths[0], "rt") as fh:
        tr = json.load(fh)
    pids = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, nm in pids.items()
                if "TPU" in nm or "/device" in nm.lower()}
    per = defaultdict(float)
    cnt = defaultdict(int)
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        nm = ev.get("name", "")
        cat = nm.split(".")[0].split("(")[0]
        per[cat] += ev.get("dur", 0) / 1e3
        cnt[cat] += 1
    print(f"ablate={ablate}")
    for name, ms in sorted(per.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{name[:60]:60s} {cnt[name]:6d} {ms / n:9.4f} ms/iter")


if __name__ == "__main__":
    main()
