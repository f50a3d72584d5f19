"""Checkpoint / restart.

The reference serializes a registered-object graph per rank with function
pointers by symbol name (src/util/checkpt/, SURVEY 3.5).  The TPU-native
state is a pure pytree + a reified deck config, so checkpointing is simply a
faithful array dump plus a JSON header; the deck (Python) is re-run to
rebuild the static program and the saved arrays replace the fresh state --
the analogue of --restore (deck/main.cc:74-91) with the config JSON playing
the role the function-pointer symbol table played.

``modify`` implements --modify (misc.cc:136+): ASCII "field value" lines
overriding num_step and the dump/clean intervals on restore.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .state import FieldState, SimState, SpeciesState

_FIELDS = [f.name for f in FieldState.__dataclass_fields__.values()]
_SP = [f.name for f in SpeciesState.__dataclass_fields__.values()]


def checkpt(state: SimState, fbase: str, tag=None, sim=None) -> str:
    """Write ``{fbase}.{tag}.npz`` (+ .json config).  Like the reference's
    checkpt(fbase, tag) naming (deck/main.cc:47-54)."""
    tag = int(state.step.max()) if tag is None else tag
    fname = f"{fbase}.{tag}"
    arrays = {}
    for n in _FIELDS:
        arrays[f"f.{n}"] = np.asarray(getattr(state.fields, n))
    for k, sp in enumerate(state.species):
        for n in _SP:
            arrays[f"sp{k}.{n}"] = np.asarray(getattr(sp, n))
    arrays["step"] = np.asarray(state.step)
    arrays["rng"] = np.asarray(state.rng)
    for n, v in (state.diag or {}).items():
        arrays[f"diag::{n}"] = np.asarray(v)
    np.savez_compressed(fname + ".npz", **arrays)

    if sim is not None:
        cfg = dict(
            num_step=sim.num_step,
            status_interval=sim.status_interval,
            sync_shared_interval=sim.sync_shared_interval,
            clean_div_e_interval=sim.clean_div_e_interval,
            clean_div_b_interval=sim.clean_div_b_interval,
            num_comm_round=sim.num_comm_round,
            damp=sim.damp,
            species=[dict(name=st.params.name, q=st.params.q, m=st.params.m,
                          capacity=st.params.capacity)
                     for st in sim.species],
            grid=dict(nx=sim.grid.nx, ny=sim.grid.ny, nz=sim.grid.nz,
                      dt=sim.grid.dt, topology=list(sim.grid.topology),
                      field_bc=list(sim.grid.field_bc),
                      particle_bc=list(sim.grid.particle_bc)),
            user_global=getattr(sim, "user_global", {}),
        )
        with open(fname + ".json", "w") as fh:
            json.dump(cfg, fh, indent=1)
    return fname


def restore(fbase_tag: str, sim=None) -> SimState:
    """Rebuild a SimState from ``{fbase}.{tag}``.  If ``sim`` is given, its
    static config is sanity-checked against the saved one (the reference
    asserts equal world size on restore, DMPPolicy.h:40-57)."""
    data = np.load(fbase_tag + ".npz")
    cfg_path = fbase_tag + ".json"
    if sim is not None and os.path.exists(cfg_path):
        with open(cfg_path) as fh:
            cfg = json.load(fh)
        gg = cfg["grid"]
        if (gg["nx"], gg["ny"], gg["nz"]) != (sim.grid.nx, sim.grid.ny,
                                              sim.grid.nz) or \
                tuple(gg["topology"]) != tuple(sim.grid.topology):
            raise ValueError("checkpoint grid/topology mismatch: "
                             f"{gg} vs {sim.grid}")
        sim.num_step = cfg["num_step"]
        sim.user_global = cfg.get("user_global", {})

    fields = FieldState(**{n: jnp.asarray(data[f"f.{n}"]) for n in _FIELDS})
    species = []
    k = 0
    while f"sp{k}.dx" in data:
        species.append(SpeciesState(
            **{n: jnp.asarray(data[f"sp{k}.{n}"]) for n in _SP}))
        k += 1
    diag = {n[len("diag::"):]: jnp.asarray(data[n])
            for n in data.files if n.startswith("diag::")}
    return SimState(fields=fields, species=tuple(species),
                    step=jnp.asarray(data["step"]),
                    rng=jnp.asarray(data["rng"]), diag=diag)


def modify(sim, path: str):
    """--modify (misc.cc:136+): ASCII 'field value' per line."""
    allowed = {"num_step", "status_interval", "sync_shared_interval",
               "clean_div_e_interval", "clean_div_b_interval",
               "num_comm_round"}
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) != 2:
                continue
            field, val = parts
            if field in allowed:
                setattr(sim, field, int(float(val)))
    return sim


def checksum(state: SimState) -> str:
    """Field/species state checksum (the optional OpenSSL checksum hooks,
    src/vpic/misc.cc:177-280) for regression comparisons."""
    import hashlib
    h = hashlib.sha256()
    for n in _FIELDS:
        h.update(np.asarray(getattr(state.fields, n)).tobytes())
    for sp in state.species:
        for n in _SP:
            h.update(np.asarray(getattr(sp, n)).tobytes())
    return h.hexdigest()
