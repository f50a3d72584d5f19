#!/usr/bin/env python
"""jax.profiler trace of the scanned 3-D reconnection step (dev tool).

Usage: trace_step3d.py [nx ny nz nppc [nsteps]] [--xla] [--sortk K]
                       [--harris] [--nores]
  --harris uses the pure harris3d deck (residency-eligible)
  --nores  disables residency on the harris deck (per-step sort)
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from vpic_tpu.models import reconnection


def main():
    a = sys.argv[1:]
    xla = "--xla" in a
    sortk = 0
    if "--sortk" in a:
        k = a.index("--sortk")
        sortk = int(a[k + 1])
        del a[k:k + 2]
    use_harris = "--harris" in a
    nores = "--nores" in a
    a = [x for x in a if not x.startswith("--")]
    nx, ny, nz, nppc = ((int(x) for x in a[:4]) if len(a) >= 4
                        else (32, 32, 32, 32))
    nsteps = int(a[4]) if len(a) > 4 else 20
    if use_harris:
        from vpic_tpu.models import harris
        p = harris.HarrisParams(nx=nx, ny=ny, nz=nz, nppc=nppc,
                                Lx=16.0, Ly=16.0, Lz=16.0)
        sim = harris.build(p)
        if nores:
            sim.pallas_residency = False
    else:
        p = reconnection.ReconnectionParams(
            nx=nx, ny=ny, nz=nz, nppc=nppc, tau_coll_interval=10 ** 9)
        sim = reconnection.build(p)
    if xla:
        sim.use_pallas = False
    if sortk:
        sim.pallas_sort_interval = sortk
    state = sim.initialize()
    adv = sim.make_multi_step(nsteps)
    state = adv(state)          # compile + warm
    jax.block_until_ready(state.fields.ex)

    logdir = "/tmp/vpic_trace3d"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        state = adv(state)
        jax.block_until_ready(state.fields.ex)

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, "no trace written"
    with gzip.open(paths[0], "rt") as fh:
        tr = json.load(fh)

    pids = {}
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}

    per = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        tname = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        cat = tname.split(".")[0].split("(")[0]
        per[cat] += dur
        cnt[cat] += 1
        total += dur

    n_particles = nx * ny * nz * nppc
    print(f"\ntrace: {paths[0]}")
    print(f"{'kernel':48s} {'count':>6s} {'total ms':>9s} {'%':>6s}")
    rows = sorted(per.items(), key=lambda kv: -kv[1])
    for name, ms in rows[:40]:
        print(f"{name[:48]:48s} {cnt[name]:6d} {ms:9.3f} {100*ms/total:5.1f}%")
    print(f"{'TOTAL':48s} {sum(cnt.values()):6d} {total:9.3f}")
    print(f"\nnp={n_particles}  steps={nsteps}  "
          f"device-total/step={total/nsteps:.3f} ms")


if __name__ == "__main__":
    main()
