"""Per-brick bucketed residency for the 3-D brick-chart path.

The 3-D kernel historically re-sorted every species every step (sortK=1:
1-deep halos make chart exits impossible), and at the 4M tier that global
lax.sort + full-capacity 8-col row gather was ~2/3 of the step (~56 ms of
79: the chip's ~6.4 ns/row gather floor over 2x 3.1M-capacity species).
Residency deletes it: particles LIVE in fixed per-brick block regions
(established once by the quantized brick sort, now with ``slack`` empty
blocks per brick) and migrate incrementally --

* the push kernel copies each block's brick-leavers into a per-block
  OUTBOX tile and marks them emitted (ops/pallas_push3d._kernel3d,
  residency=True);
* :func:`plan_exchange` routes outbox rows to destination bricks with ONE
  packed sort over outbox rows only (nblocks*out_cap lanes, ~1-3% of
  capacity) and allocates them to destination blocks by free space;
* :func:`merge_p` (a second small Pallas kernel) drops the emitted marks,
  compacts each block's survivors with the exact f32-HIGHEST one-hot
  compaction measured in round 4 (triangular-matmul prefix sums -- Mosaic
  has no cumsum; a one-hot dot moves rows bit-exactly), and appends the
  routed newcomers -- so the species arrays are COMPLETE at every step
  boundary (no in-transit particles; energies/dumps/checkpoints see every
  lane).

Safety valve: when the exchange would overflow (a brick's inflow exceeds
its free slots), when any leaver exceeded the outbox cap, or when any
surviving lane sits outside its home brick's interior (outlier-pass
replays near brick seams), the step falls back to the full quantized
brick sort under a lax.cond -- the sort becomes event-driven instead of
per-step.  Invariant after every step: every live lane is interior to its
home brick, so the 1-deep chart halo is reached only DURING a step.

Reference parity: replaces the per-step sort_p cadence
(/root/reference/src/species_advance/standard/sort_p.c, deck
sort_interval) for 3-D decks; the reference amortizes its sort over
~20+ steps, residency amortizes the full sort over overflow events.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid
from .pallas_push import _round_up, packed_src_sort
from .pallas_push3d import _prefix_excl, brick_of, nbricks

OUT_CAP = 128     # per-block outbox tile columns
INB = 128         # per-block inbox tile columns


def static_layout(capacities, block: int = 1024):
    """Static block layout of the concatenated multi-species launch:
    (nblocks_total, spid (nblocks,) int32 np, usable (nblocks,) bool np).
    ``usable`` is False for blocks not entirely inside their species'
    capacity (the partial tail block): newcomers may only be placed in
    fully-real blocks (the merge output is sliced back to capacity)."""
    spids, usable = [], []
    for s, N in enumerate(capacities):
        nb = _round_up(N, block) // block
        spids += [s] * nb
        usable += [(j + 1) * block <= N for j in range(nb)]
    return (len(spids), np.asarray(spids, np.int32),
            np.asarray(usable, bool))


def slack_blocks(g: Grid, n0_list, capacities, block: int = 1024,
                 want: int = 4) -> int:
    """Largest per-brick slack (<= want) such that the quantized layout
    with slack provably fits every species' capacity under the no-growth
    live bound n0.  Returns 0 when even slack-1 cannot fit (residency
    should then stay off)."""
    nb = nbricks(g)
    for slack in range(want, 0, -1):
        ok = True
        for n0, N in zip(n0_list, capacities):
            need = (_round_up(max(n0, 1), block)
                    + nb * (1 + slack) * block)
            if need > N:
                ok = False
                break
        if ok:
            return slack
    return 0


def extents(g: Grid, n0_list, slack: int, block: int = 1024):
    """Static per-species residency extents: the slack-padded quantized
    layout provably fits in the first E slots (same formula as the
    brick sort's extent bound), so the WHOLE residency path -- packs,
    kernels, exchange, merge -- runs on [0, E) slices and the dead
    capacity tail never moves through HBM again.  Multiples of block."""
    nb = nbricks(g)
    return [_round_up(max(n0, 1), block) + nb * (1 + slack) * block
            for n0 in n0_list]


def slice_species(sp, E: int):
    """View of the first E slots (residency keeps every live lane
    inside them)."""
    return sp.replace(dx=sp.dx[:E], dy=sp.dy[:E], dz=sp.dz[:E],
                      i=sp.i[:E], ux=sp.ux[:E], uy=sp.uy[:E],
                      uz=sp.uz[:E], w=sp.w[:E], live=sp.live[:E])


def join_species(spE, sp_full, E: int):
    """Reattach the untouched dead capacity tail."""
    cat = lambda a, b: jnp.concatenate([a, b[E:]])
    return sp_full.replace(
        dx=cat(spE.dx, sp_full.dx), dy=cat(spE.dy, sp_full.dy),
        dz=cat(spE.dz, sp_full.dz), i=cat(spE.i, sp_full.i),
        ux=cat(spE.ux, sp_full.ux), uy=cat(spE.uy, sp_full.uy),
        uz=cat(spE.uz, sp_full.uz), w=cat(spE.w, sp_full.w),
        live=cat(spE.live, sp_full.live), np=spE.np)


def block_counts(sps, emits, block: int = 1024):
    """Per-block free-slot counts AFTER the merge will drop emitted lanes:
    free_j = block - (n_live_j - n_emit_j), concatenated across species
    in launch block order."""
    frees = []
    for sp, emit in zip(sps, emits):
        N = sp.capacity
        Np = _round_up(N, block)
        live = jnp.pad(sp.live.astype(jnp.int32), (0, Np - N))
        em = jnp.pad((emit > 0.5).astype(jnp.int32), (0, Np - N))
        n_live = jnp.sum(live.reshape(-1, block), axis=1)
        n_emit = jnp.sum(em.reshape(-1, block), axis=1)
        frees.append(block - (n_live - n_emit))
    return jnp.concatenate(frees) if len(frees) > 1 else frees[0]


def max_routed(nblocks: int, out_cap: int = OUT_CAP) -> int:
    """Static cap on total routed rows per step (the compact-gather
    bound): half the worst case = ~6% of lanes crossing bricks per step
    (harris3d at the 4M tier measures ~4.4%; the gather costs only
    ~5 ns/row so the slack is cheap).  Exceeding it rebuckets -- but
    NOTE that unlike layout overflows a churn-bound overflow recurs
    every step (the sort does not reduce crossing traffic), so a deck
    living beyond ~6% churn should set pallas_residency=False."""
    return max(32768, _round_up(nblocks * out_cap // 2, 1024))


def plan_exchange(obx, homes_cat, spid, usable, free_j, g: Grid,
                  inb: int = INB):
    """Route outbox rows to destination (species, brick) groups and
    allocate them greedily to the group's blocks by free space.

    Returns (compact, starts_j, a_j, overflow):
    ``compact`` is the (8, MAXIN + 128) lane-major matrix of the valid
    outbox rows in destination-sorted order (ONE bounded row gather --
    everything downstream reads it by block-granular DMA, not by row
    gather); block j takes sorted rows [starts_j, starts_j + a_j);
    ``overflow`` is True when any group's inflow exceeds its allocatable
    capacity or the routed total exceeds the compact bound (the caller
    must rebucket instead of merging -- emitted lanes are still
    resident, so nothing is lost)."""
    nb = nbricks(g)
    nblocks = homes_cat.shape[0]
    out_cap = obx.shape[1] // nblocks
    nsp = int(spid.max()) + 1 if len(spid) else 1
    NKEY = nsp * nb

    valid_r = obx[8] > 0.5
    vox_r = jnp.maximum(obx[3].astype(jnp.int32), 1)
    dest = jnp.clip(brick_of(vox_r, g), 0, nb - 1)
    spid_r = jnp.repeat(jnp.asarray(spid), out_cap)
    key_r = jnp.where(valid_r, spid_r * nb + dest, NKEY)
    N_OUT = key_r.shape[0]
    keys_sorted, sorted_src = packed_src_sort(key_r, N_OUT, NKEY + 1)
    seg = jnp.searchsorted(
        keys_sorted, jnp.arange(NKEY + 1, dtype=jnp.int32)).astype(
            jnp.int32)
    c_k = seg[1:] - seg[:-1]                              # (NKEY,)

    key_j = jnp.asarray(spid) * nb + homes_cat            # nondecreasing
    cap_j = jnp.where(jnp.asarray(usable),
                      jnp.minimum(free_j, inb), 0).astype(jnp.int32)
    cap_j = jnp.maximum(cap_j, 0)
    csp = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cap_j)])
    j_start = jnp.searchsorted(
        key_j, jnp.arange(NKEY + 1, dtype=jnp.int32)).astype(jnp.int32)
    off = csp[j_start]                                    # (NKEY+1,)
    capsum_k = off[1:] - off[:-1]                         # (NKEY,)
    overflow = jnp.any(c_k > capsum_k)

    prefix_j = csp[:-1] - off[:-1][key_j]    # cap before j within group
    ck_j = c_k[key_j]
    q_j = jnp.minimum(ck_j, prefix_j)
    a_j = jnp.clip(jnp.minimum(cap_j, ck_j - q_j), 0)
    starts_j = seg[key_j] + q_j

    # compact the valid rows in sorted order: invalid keys sort last, so
    # the valid rows are the prefix [0, seg[NKEY]) -- bound it statically
    # and rebucket when exceeded
    MAXIN = max_routed(nblocks, out_cap)
    overflow = overflow | (seg[NKEY] > MAXIN)
    mat = jnp.stack([obx[0], obx[1], obx[2], obx[3],
                     obx[4], obx[5], obx[6], obx[7]], axis=1)
    rows = jnp.take(mat, sorted_src[:MAXIN], axis=0)    # (MAXIN, 8)
    compact = jnp.pad(rows.T, ((0, 0), (0, 128)))       # (8, MAXIN+128)
    stats = jnp.stack([seg[NKEY], jnp.max(c_k - capsum_k)])
    return compact, starts_j, a_j, overflow, stats


def _bdot(x, oh):
    """Exact dot of f32 rows against an EXACT bf16 0/1 one-hot in 4
    full-rate MXU passes: the 4-way bf16 split covers all 24 mantissa
    bits, each residual subtraction is Sterbenz-exact, and products
    against 0/1 are exact (measured bit-exact in the round-4 rig,
    scripts/residency_grid_bench2.py; 5.7 vs HIGHEST's 9.0 us/block)."""
    d = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = x.astype(jnp.bfloat16)
    r1 = x - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    r2 = r1 - h2.astype(jnp.float32)
    h3 = r2.astype(jnp.bfloat16)
    h4 = (r2 - h3.astype(jnp.float32)).astype(jnp.bfloat16)
    return (d(h1, oh) + d(h2, oh)) + (d(h3, oh) + d(h4, oh))


BAND = 128      # max keeper displacement the banded compaction covers


def _merge_kernel(P, m_ref, rel_ref, a_ref,
                  dx_ref, dy_ref, dz_ref, i_ref, ux_ref, uy_ref, uz_ref,
                  w_ref, lv_ref, em_ref, wa_ref, wb_ref,
                  odx, ody, odz, oi, oux, ouy, ouz, ow, olv):
    """Per-block compaction + insertion, SoA in / SoA out (direct (1, P)
    row views of the species arrays: packing 10 rows + unpacking 9 for a
    separate matrix cost ~4 ms/step of pure XLA copies at the 4M tier).
    wa/wb: two consecutive (8, 128) windows of the dest-sorted compact
    row matrix, fetched by prefetch-scalar-driven index maps (m_ref =
    starts // 128) -- block-granular DMA instead of a per-row gather
    over nblocks*inb tiles (~17 ms/step, measured).  This block's
    newcomers are compact lanes [rel, rel + a) of the 256-lane window.
    Keepers (live and not emitted) compact to the front in lane order;
    newcomers follow.  Row moves are exact one-hot dots (split-bf16,
    bit-exact).

    The expensive part is MATERIALIZING the one-hot (compare area =
    P * (S + BAND) elementwise ops), so three fast paths bound it:
    * dead blocks (no keepers, no newcomers) write dead lanes and skip
      everything;
    * blocks whose keepers don't move (no drops before the last keeper)
      copy rows verbatim and only place newcomers with a small
      (256, P) one-hot;
    * keepers move left by at most the number of DROPPED slots before
      them; when that is <= BAND the one-hot is evaluated on a banded
      (S + BAND, S) window per output segment.  Rare heavier churn
      (mass outlier kills) falls back to the full quadratic one-hot
      under pl.when."""
    bnum = pl.program_id(0)
    lvf = lv_ref[0, :]
    emf = em_ref[0, :]
    keep = (lvf > 0.5) & (emf < 0.5)
    kf = keep.astype(jnp.float32)
    pos = _prefix_excl(kf, P)
    nk = jnp.sum(kf)
    lanef = jax.lax.broadcasted_iota(
        jnp.int32, (1, P), 1).astype(jnp.float32)[0]
    # displacement of each keeper = lane - pos; bounded by total drops
    disp_max = jnp.max(jnp.where(keep, lanef - pos, 0.0))
    tgtk = jnp.where(keep, pos, -1.0)
    rel = rel_ref[bnum]
    a = a_ref[bnum]
    W = jnp.concatenate([wa_ref[:, :], wb_ref[:, :]], axis=1)  # (8, 256)
    l_io = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)[0]
    sel = (l_io >= rel) & (l_io < rel + a)
    tgtn = jnp.where(sel, nk + (l_io - rel).astype(jnp.float32), -1.0)
    ntot = nk + a.astype(jnp.float32)
    X = jnp.concatenate(
        [dx_ref[:, :], dy_ref[:, :], dz_ref[:, :],
         i_ref[:, :].astype(jnp.float32), ux_ref[:, :], uy_ref[:, :],
         uz_ref[:, :], jnp.where(lvf > 0.5, w_ref[:, :], 0.0)], axis=0)
    S = min(512, P)

    def _write(rows, live_row):
        odx[0, :] = rows[0]
        ody[0, :] = rows[1]
        odz[0, :] = rows[2]
        oi[0, :] = rows[3].astype(jnp.int32)
        oux[0, :] = rows[4]
        ouy[0, :] = rows[5]
        ouz[0, :] = rows[6]
        ow[0, :] = rows[7]
        olv[0, :] = live_row

    @pl.when(ntot == 0)
    def _dead():
        _write(X, jnp.zeros((P,), jnp.float32))

    def _place_new(base_rows):
        # newcomers via one small (256, P) one-hot onto precomputed rows
        j_all = jax.lax.broadcasted_iota(
            jnp.int32, (256, P), 1).astype(jnp.float32)
        ohn = (tgtn[:, None] == j_all).astype(jnp.bfloat16)
        return base_rows + _bdot(W, ohn)

    @pl.when((ntot > 0) & (disp_max == 0.0))
    def _copy():
        keepm = kf[None, :]
        _write(_place_new(X * keepm), (lanef < ntot).astype(jnp.float32))

    @pl.when((ntot > 0) & (disp_max > 0.0) & (disp_max <= float(BAND)))
    def _banded():
        tp = jnp.concatenate(
            [tgtk, jnp.full((BAND,), -1.0, jnp.float32)])
        Xp = jnp.concatenate(
            [X, jnp.zeros((8, BAND), jnp.float32)], axis=1)
        w = S + BAND
        segs = []
        for s in range(P // S):
            lo = S * s
            seg_t = tp[lo:lo + w]
            j_io = (jax.lax.broadcasted_iota(jnp.int32, (w, S), 1)
                    + lo).astype(jnp.float32)
            oh = (seg_t[:, None] == j_io).astype(jnp.bfloat16)
            segs.append(_bdot(Xp[:, lo:lo + w], oh))
        rows = segs[0] if len(segs) == 1 else jnp.concatenate(segs, 1)
        _write(_place_new(rows), (lanef < ntot).astype(jnp.float32))

    @pl.when(disp_max > float(BAND))
    def _full():
        segs = []
        for s in range(P // S):
            j_iota = (jax.lax.broadcasted_iota(jnp.int32, (P, S), 1)
                      + S * s).astype(jnp.float32)
            oh = (tgtk[:, None] == j_iota).astype(jnp.bfloat16)
            segs.append(_bdot(X, oh))
        rows = segs[0] if len(segs) == 1 else jnp.concatenate(segs, 1)
        _write(_place_new(rows), (lanef < ntot).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("block",))
def merge_p(sps, emits, compact, starts_j, a_j, block: int = 1024):
    """All species through ONE merge launch: drop emitted lanes, compact
    survivors per block, insert routed newcomers (block j reads compact
    lanes [starts_j, starts_j + a_j) through two prefetch-indexed
    128-lane DMA windows).  Species fields ride as direct (1, N) row
    views (no pack/unpack matrices).  Capacities must be multiples of
    ``block`` (the residency path slices to extent multiples).  Returns
    the merged species list (same layout contract as the brick sort:
    live lanes packed at the front of every block)."""
    sps = tuple(sps)
    for sp in sps:
        assert sp.capacity % block == 0, "merge_p needs block-multiple " \
            "capacities (use extent slices)"
    cat = (lambda xs: xs[0] if len(xs) == 1
           else jnp.concatenate(xs, axis=1))
    row = lambda name: cat([getattr(sp, name)[None, :] for sp in sps])
    dxs, dys, dzs = row("dx"), row("dy"), row("dz")
    i_s = row("i")
    uxs, uys, uzs, ws = row("ux"), row("uy"), row("uz"), row("w")
    lvs = cat([sp.live.astype(jnp.float32)[None, :] for sp in sps])
    ems = cat([e[None, :] for e in emits])
    Nps = [sp.capacity for sp in sps]
    Ntot = sum(Nps)
    nblocks = Ntot // block
    nwin = compact.shape[1] // 128
    m_j = jnp.clip(starts_j // 128, 0, nwin - 2)
    rel_j = starts_j - 128 * m_j
    interpret = jax.devices()[0].platform != "tpu"
    rspec = pl.BlockSpec((1, block), lambda b, *_: (0, b))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[rspec] * 10
        + [pl.BlockSpec((8, 128), lambda b, m, r, a: (0, m[b])),
           pl.BlockSpec((8, 128), lambda b, m, r, a: (0, m[b] + 1))],
        out_specs=[rspec] * 9,
    )
    f32r = lambda: jax.ShapeDtypeStruct((1, Ntot), jnp.float32)
    out_shapes = [f32r(), f32r(), f32r(),
                  jax.ShapeDtypeStruct((1, Ntot), jnp.int32),
                  f32r(), f32r(), f32r(), f32r(), f32r()]
    outs = pl.pallas_call(
        functools.partial(_merge_kernel, block),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(m_j, rel_j, a_j.astype(jnp.int32),
      dxs, dys, dzs, i_s, uxs, uys, uzs, ws, lvs, ems,
      compact, compact)
    (odx, ody, odz, oi, oux, ouy, ouz, ow, olv) = outs
    new_sps, off = [], 0
    for sp, Np in zip(sps, Nps):
        N = sp.capacity
        sl = slice(off, off + N)
        live = olv[0, sl] > 0.5
        new_sps.append(sp.replace(
            dx=odx[0, sl], dy=ody[0, sl], dz=odz[0, sl],
            i=oi[0, sl],
            ux=oux[0, sl], uy=ouy[0, sl], uz=ouz[0, sl],
            w=ow[0, sl], live=live,
            np=jnp.sum(live.astype(jnp.int32))))
        off += Np
    return new_sps


def any_misplaced(sps, emits, homes, g: Grid, block: int = 1024):
    """True when any live, non-emitted lane's voxel is outside its home
    brick (outlier-pass replays near seams, capped leavers): the caller
    must rebucket to restore the interior-residency invariant."""
    out = jnp.bool_(False)
    for sp, emit, home in zip(sps, emits, homes):
        N = sp.capacity
        hl = jnp.repeat(home, block)[:N]
        br = brick_of(jnp.maximum(sp.i, 1), g)
        mis = sp.live & (emit < 0.5) & (br != hl)
        out = out | jnp.any(mis)
    return out
