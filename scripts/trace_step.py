#!/usr/bin/env python
"""Capture a jax.profiler trace of the scanned harris step and print a
per-kernel cost table (dev tool; the trace is the ONLY reliable per-op
signal over the tunneled TPU -- see CLAUDE.md).

Usage: trace_step.py [nx ny nppc [nsteps]] [--chart] [--sortk K]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from vpic_tpu.models import harris


def main():
    a = sys.argv[1:]
    chart = "--chart" in a
    sortk = 0
    if "--sortk" in a:
        k = a.index("--sortk")
        sortk = int(a[k + 1])
        del a[k:k + 2]
    a = [x for x in a if not x.startswith("--")]
    nx, ny, nppc = (int(x) for x in a[:3]) if len(a) >= 3 else (64, 64, 64)
    nsteps = int(a[3]) if len(a) > 3 else 20
    p = harris.HarrisParams(nx=nx, ny=ny, nppc=nppc)
    sim = harris.build(p)
    if chart:
        sim.pallas_chart2d = True
    if sortk:
        sim.pallas_sort_interval = sortk
    state = sim.initialize()
    adv = sim.make_multi_step(nsteps)
    state = adv(state)          # compile + warm
    jax.block_until_ready(state.fields.ex)

    logdir = "/tmp/vpic_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        state = adv(state)
        jax.block_until_ready(state.fields.ex)

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, "no trace written"
    with gzip.open(paths[0], "rt") as fh:
        tr = json.load(fh)

    # find the device-side TensorFlow Op / XLA Op events
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
        # keep only leaf XLA-op rows (tid names vary; dedupe by thread name)
        tname = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # ms
        cat = tname.split(".")[0].split("(")[0]
        per[cat] += dur
        cnt[cat] += 1
        total += dur

    n_particles = nx * ny * nppc
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
