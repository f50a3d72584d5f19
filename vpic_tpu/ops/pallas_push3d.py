"""Fused Pallas advance_p for 3-D grids: brick charts.

The 2-D kernel (ops/pallas_push.py) relies on crossings moving the linear
voxel index by at most +-NX, so a contiguous index window can hold a whole
walk.  In 3-D a z-crossing moves the index by +-NX*NY, which no affordable
window covers.  This module re-tiles the voxel space into 8x8x8 BRICKS,
each stored WITH its own 1-deep halo as a contiguous 10x10x10 = 1000-cell
chart padded to 1024 lanes:

* The interpolator table and accumulator are laid out chart-major
  (rows, nbricks*1024) by static sliced stacks (pure dense ops); halo
  cells duplicate neighbor-brick (or periodic-wrap ghost) data.  Halo
  deposits fold back onto canonical cells by the adjoint sliced adds.
* Particle indices stay CANONICAL everywhere.  The kernel derives each
  lane's chart-local cell from (canonical voxel, block's brick): lanes
  whose cell is the brick interior or its 1-deep halo are in-chart
  (halo residency -- a crosser not yet re-sorted -- is implicit); walks
  move chart-locally by +-1 cell per axis, always inside the 1024-lane
  window, and write back canonical indices (periodic wrap applied).
  Nothing outside the kernel ever sees a chart index, so sharding,
  rho/hydro, collisions, dumps, and checkpointing are untouched.
* The brick counting sort quantizes each brick's slot range up to the
  kernel block size so every particle block maps to exactly one brick
  (w0 = brick * 1024); pad slots are dead lanes.  If quantization would
  overflow capacity, offsets fall back to tight packing and straddling
  lanes are flagged to the exact outlier pass.
* Pre-flagged lanes (chart exits from the outer shell, absorbing/custom/
  remote wall crossings) are frozen untouched and replayed exactly by
  ops/pallas_push.outlier_pass on canonical voxels.  Global reflecting
  walls bounce in-kernel; periodic wrap needs no in-kernel logic (the
  halo cell IS the wrapped copy).

Reference parity: replaces advance_p/move_p (species_advance) + the
accumulator machinery (sf_interface) for nz > 1 decks, as the 2-D kernel
does for nz == 1.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import P_PERIODIC, REFLECT_PARTICLES, Grid
from ..state import SpeciesState
from .push import BIG, ONE_THIRD, TWO_FIFTEENTHS
from .pallas_push import _eff_bc, _hilo_dot, _round_up

B3 = 8                      # 3-D brick side (cells)
CH2_B = (16, 8, 1)          # 2-D brick dims (x, y, z cells)
CH2_HALO = 8                # 2-D halo depth = max sort staleness (steps)


def chart_dims(g: Grid):
    """Per-axis chart geometry: (brick B, halo H, chart C, padded lane
    count S, used lanes).  3-D grids tile 8^3 bricks with a 1-deep halo
    (1000 -> 1024 lanes, re-sorted every step); 2-D (nz == 1) grids tile
    16x8 bricks with an 8-deep halo (32x24 = 768 lanes exactly), so the
    brick sort only needs to run every <= 8 steps and the chart size is
    independent of NX -- the fix for the window kernel's NX-proportional
    windows at large grids."""
    if g.nz > 1:
        B = (B3, B3, B3)
        HAL = (1, 1, 1)
    else:
        B = CH2_B
        HAL = (CH2_HALO, CH2_HALO, 0)
    C = tuple(b + 2 * h if n > 1 else 1
              for b, h, n in zip(B, HAL, (g.nx, g.ny, g.nz)))
    used = C[0] * C[1] * C[2]
    S = _round_up(used, 128)
    return B, HAL, C, S, used


def supports3d(g: Grid, max_capacity: int = 0) -> bool:
    """Brick charts need every axis divisible by the brick side, at least
    one full chart per periodic axis (nearest-image wrap unambiguity),
    and particle counts below 2^24 per species (the sort's exact-f32
    bound).  All particle BCs are allowed (reflect in-kernel; periodic
    via halo copies; absorb/custom/remote pre-flagged like the window
    kernel).  Covers 3-D grids AND 2-D (nz == 1) grids in the 16x8
    deep-halo tiling."""
    B, HAL, C, S, used = chart_dims(g)
    for n, b, c in zip((g.nx, g.ny, g.nz), B, C):
        if n <= 1 and b == 1:
            continue
        if n % b or n < c:
            return False
    if max_capacity and max_capacity >= (1 << 30):
        return False           # int32 index space (sort/gather indices)
    # voxel indices ride the packed kernel IO value-encoded in f32
    return 1024 <= g.nv < (1 << 24)


def _nb(g: Grid) -> Tuple[int, int, int]:
    B, _, _, _, _ = chart_dims(g)
    return g.nx // B[0], g.ny // B[1], max(g.nz // B[2], 1)


def nbricks(g: Grid) -> int:
    nbx, nby, nbz = _nb(g)
    return nbx * nby * nbz


def chart_width(g: Grid) -> int:
    return nbricks(g) * chart_dims(g)[3]


def _extend_axis(a, aa, ax, g: Grid, h: int):
    """Extend array axis ``aa`` (grid axis ``ax``) so index j maps to
    canonical cell j - h + 1: for halo depth h the extension adds h-1
    layers beyond the 1-deep canonical ghost on each side -- periodic
    wraps of the interior, zeros otherwise (never read: lanes cannot
    reside past a non-periodic wall)."""
    if h <= 1:
        return a
    n = (g.nx, g.ny, g.nz)[ax]
    from .pallas_push import _eff_bc
    if _eff_bc(g, ax, -1) == P_PERIODIC and g.topology[ax] == 1:
        # left layers are cells [1-h, 0) -> wrapped interior [n+1-h, n);
        # right layers are cells [n+2, n+h] -> wrapped interior [2, h+1)
        lo = jax.lax.slice_in_dim(a, n + 1 - h, n, axis=aa)
        hi = jax.lax.slice_in_dim(a, 2, h + 1, axis=aa)
    else:
        shp = list(a.shape)
        shp[aa] = h - 1
        lo = jnp.zeros(shp, a.dtype)
        hi = jnp.zeros(shp, a.dtype)
    return jnp.concatenate([lo, a, hi], axis=aa)


def to_chart_T(flat_T, g: Grid):
    """(rows, >=nv) canonical flat table -> (rows, nbricks*S) chart table
    via static sliced stacks (dense; no gathers).  Halo layer 1 comes
    from the canonical ghosts (which already hold BC-correct values,
    ops/interp.load_interpolator_T); deeper halo layers come from
    periodic-wrap extensions built here."""
    B, HAL, C, S, used = chart_dims(g)
    nbx, nby, nbz = _nb(g)
    rows = flat_T.shape[0]
    a = flat_T[:, :g.nv].reshape(rows, g.NZ, g.NY, g.NX)
    a = _extend_axis(a, 1, 2, g, HAL[2])
    a = _extend_axis(a, 2, 1, g, HAL[1])
    a = _extend_axis(a, 3, 0, g, HAL[0])
    # slice per brick: cell range [k*b + 1 - h, k*b + b + h + 1) is the
    # extended-index range [k*b + off, k*b + off + C) with off = 0 for
    # h >= 1 (ext j = cell + h - 1) and off = 1 for h == 0 (no ghost in
    # the chart: local 0 IS interior cell k*b + 1)
    off = [1 if h == 0 else 0 for h in HAL]
    a = jnp.stack([jax.lax.slice_in_dim(
        a, i * B[2] + off[2], i * B[2] + off[2] + C[2], axis=1)
        for i in range(nbz)], axis=1)
    a = jnp.stack([jax.lax.slice_in_dim(
        a, j * B[1] + off[1], j * B[1] + off[1] + C[1], axis=3)
        for j in range(nby)], axis=2)
    a = jnp.stack([jax.lax.slice_in_dim(
        a, k * B[0] + off[0], k * B[0] + off[0] + C[0], axis=5)
        for k in range(nbx)], axis=3)   # (R, nbz, nby, nbx, cz, cy, cx)
    a = a.reshape(rows, nbricks(g), used)
    return jnp.pad(a, ((0, 0), (0, 0), (0, S - used))).reshape(rows, -1)


def fold_chart_acc(acc_chart, g: Grid):
    """Adjoint of to_chart_T for the accumulator: overlapping halo deposits
    add back onto their canonical ghosted cells (deep-halo layers fold
    onto the wrapped interior).  Returns (rows, NZ*NY*NX) canonical flat;
    the single-ghost-plane folding happens downstream
    (pallas_push.fold_ghost_acc_T works on this layout)."""
    B, HAL, C, S, used = chart_dims(g)
    nbx, nby, nbz = _nb(g)
    rows = acc_chart.shape[0]
    a = acc_chart.reshape(rows, nbricks(g), S)[:, :, :used]
    a = a.reshape(rows, nbz, nby, nbx, C[2], C[1], C[0])

    EX = lambda ax: (g.NX, g.NY, g.NZ)[ax] + 2 * max(HAL[ax] - 1, 0)
    off = [1 if h == 0 else 0 for h in HAL]

    ox = jnp.zeros((rows, nbz, nby, C[2], C[1], EX(0)), acc_chart.dtype)
    for k in range(nbx):
        o = k * B[0] + off[0]
        ox = ox.at[..., o:o + C[0]].add(a[:, :, :, k])
    oy = jnp.zeros((rows, nbz, C[2], EX(1), EX(0)), acc_chart.dtype)
    for j in range(nby):
        o = j * B[1] + off[1]
        oy = oy.at[:, :, :, o:o + C[1], :].add(ox[:, :, j])
    oz = jnp.zeros((rows, EX(2), EX(1), EX(0)), acc_chart.dtype)
    for i in range(nbz):
        o = i * B[2] + off[2]
        oz = oz.at[:, o:o + C[2]].add(oy[:, i])

    def unextend(a, aa, ax):
        h = HAL[ax]
        if h <= 1:
            return a
        n = (g.nx, g.ny, g.nz)[ax]
        from .pallas_push import _eff_bc
        core = jax.lax.slice_in_dim(a, h - 1, h - 1 + n + 2, axis=aa)
        if _eff_bc(g, ax, -1) == P_PERIODIC and g.topology[ax] == 1:
            lo = jax.lax.slice_in_dim(a, 0, h - 1, axis=aa)
            hi = jax.lax.slice_in_dim(a, h - 1 + n + 2,
                                      2 * (h - 1) + n + 2, axis=aa)
            # ext layers [0, h-1) are cells [1-h, -1] -> wrapped interior
            # cells [n+1-h, n-1]; layers past the core are cells
            # [n+2, n+h] -> wrapped interior cells [2, h]
            pad_lo = [(0, 0)] * core.ndim
            pad_lo[aa] = (n + 1 - h, 2)
            pad_hi = [(0, 0)] * core.ndim
            pad_hi[aa] = (2, n + 1 - h)
            core = core + jnp.pad(lo, pad_lo) + jnp.pad(hi, pad_hi)
        return core

    oz = unextend(oz, 3, 0)
    oz = unextend(oz, 2, 1)
    oz = unextend(oz, 1, 2)
    return oz.reshape(rows, -1)


def brick_of(sp_i, g: Grid):
    """Canonical voxel -> home brick id (live-lane use only)."""
    B, _, _, _, _ = chart_dims(g)
    nbx, nby, nbz = _nb(g)
    zi, r = jnp.divmod(sp_i, g.sz)
    yi, xi = jnp.divmod(r, g.sy)
    return ((xi - 1) // B[0] + nbx * ((yi - 1) // B[1]
                                      + nby * ((zi - 1) // B[2])))


def brick_sort_p_home(sp: SpeciesState, g: Grid, quantum: int = 1024,
                      extent: int = 0, slack: int = 0):
    """Counting sort by home brick with per-brick slot ranges quantized up
    to the kernel block size (every block -> one brick).  Dead lanes are
    dropped (they carry no information); pad slots become dead.  Falls
    back to tight packing when quantization would overflow capacity.
    Returns (sorted_species, (capacity // quantum,) block home-brick map)
    -- the map is the layout's OWN block -> brick assignment and stays the
    kernel's charting authority until the next sort.

    ``extent`` (static) bounds the LIVE slots when the deck can prove no
    growth/reorder between sorts (see pallas_push.bucket_sort_p): the
    row gather's ~6.4 ns/row floor then skips the capacity slack -- the
    3-D path sorts EVERY step, so this is a direct step-cost cut.  The
    quantization slack (nbricks * quantum) is added here so the
    quantized layout never overflows the sorted extent.

    ``slack`` (static) adds that many EXTRA empty blocks to every brick's
    region (including empty bricks).  The residency path (ops/residency)
    uses this headroom to absorb cross-brick migration between rebuckets;
    the per-step-sort path leaves it 0."""
    from .push import gather_sp_rows
    N = sp.capacity
    E = (min(_round_up(extent + nbricks(g) * (1 + slack) * quantum,
                       quantum), N)
         if extent else N)
    sl = (lambda a: a[:E]) if E < N else (lambda a: a)
    nb = nbricks(g)
    b = jnp.where(sl(sp.live), brick_of(sl(sp.i), g), nb)
    # ceil: the home map must match the diag-initialized
    # ceil(capacity/quantum) shape for non-multiple capacities (lax.cond
    # branches and scan carries are shape-strict)
    src, home = _sort_src_q(b, nb, E, quantum,
                            nhome=(N + quantum - 1) // quantum,
                            slack=slack)
    moved = gather_sp_rows(jnp.maximum(src, 0),
                           sl(sp.dx), sl(sp.dy), sl(sp.dz), sl(sp.ux),
                           sl(sp.uy), sl(sp.uz), sl(sp.w), sl(sp.i),
                           sl(sp.live))
    dx, dy, dz, ux, uy, uz, w, i, live = moved
    live = live & (src >= 0)
    w = jnp.where(live, w, 0.0)
    if E < N:
        olds = (sp.dx, sp.dy, sp.dz, sp.ux, sp.uy, sp.uz,
                jnp.where(sp.live, sp.w, 0.0), sp.i, sp.live)
        join = lambda m, o: jnp.concatenate([m, o[E:]])
        dx, dy, dz, ux, uy, uz, w, i = (
            join(m, o) for m, o in zip(
                (dx, dy, dz, ux, uy, uz, w, i), olds[:8]))
        # tail slots are dead by the extent contract
        live = jnp.concatenate([live, jnp.zeros(N - E, bool)])
    return sp.replace(dx=dx, dy=dy, dz=dz, ux=ux, uy=uy, uz=uz,
                      w=w, i=i, live=live), home


def brick_sort_p(sp: SpeciesState, g: Grid, quantum: int = 1024,
                 extent: int = 0):
    """brick_sort_p_home without the home map (tests / standalone use)."""
    return brick_sort_p_home(sp, g, quantum, extent)[0]


def _sort_src_q(b, nb: int, N: int, quantum: int, nhome: int = 0,
                slack: int = 0):
    """Per-OUTPUT-slot source index for the quantized brick sort (-1 for
    gap/dead slots) plus the (nhome,) block -> home-brick map the
    layout implies (EXACT -- this is the assignment the kernel must chart
    each block against until the next sort; deriving it per step from
    drifted lane positions misassigns collectively-drifting blocks and
    floods the outlier pass).  Returns (src, home).  ``nhome`` >
    N // quantum extends the home map over a dead capacity tail (extent
    sorts): those blocks are empty, their home value is arbitrary.

    ONE stable key-value sort orders the lanes by brick; per-brick segment
    starts come from a vectorized searchsorted, and the quantized layout
    (each brick's slots rounded up to the block size) is materialized by
    slicing per-output-block RUNS out of the sorted source list -- the
    per-block source shift seg_start[k] - qoff[k] is constant inside a
    block because quantum == block.  Replaces the old digit-one-hot
    counting machinery + full-N inverse scatter (scatters are latency-
    bound: the scatter alone cost more than this whole function)."""
    from .pallas_push import packed_src_sort
    b_sorted, sorted_src = packed_src_sort(b, N, nb + 1)
    seg_start = jnp.searchsorted(
        b_sorted, jnp.arange(nb + 1, dtype=b.dtype)).astype(jnp.int32)
    totb = seg_start[1:] - seg_start[:-1]                    # (nb,)
    totq = ((totb + quantum - 1) // quantum + slack) * quantum
    qend = jnp.cumsum(totq)
    qoff = qend - totq
    ok = qend[-1] <= N if nb else jnp.bool_(True)

    nblk = max((N + quantum - 1) // quantum, nhome)
    blk0 = jnp.arange(nblk, dtype=jnp.int32) * quantum       # slot of blk
    # brick owning each output block (quantized layout); blocks past the
    # last brick's region get k = nb - 1 and mask to empty via rem <= 0
    k = jnp.clip(jnp.searchsorted(qend, blk0, side="right"), 0, nb - 1)
    start_j = blk0 + seg_start[k] - qoff[k]                  # first source
    rem = jnp.clip(totb[k] - (blk0 - qoff[k]), 0, quantum)   # live in blk
    srcp = jnp.pad(sorted_src, (0, quantum))                 # slice guard
    runs = jax.vmap(
        lambda s: jax.lax.dynamic_slice(srcp, (s,), (quantum,)))(start_j)
    lane = jnp.arange(quantum, dtype=jnp.int32)[None, :]
    q_src = jnp.where(lane < rem[:, None], runs, -1).reshape(-1)[:N]

    # tight-packing fallback (quantized layout would overflow capacity):
    # compact sorted order, dead lanes (key nb) dropped
    n_live = seg_start[nb]
    t_src = jnp.where(jax.lax.iota(jnp.int32, N) < n_live, sorted_src, -1)
    # fallback home = brick of the block's first slot (straddling minority
    # lanes flag to the outlier pass, as before)
    t_home = jnp.clip(b_sorted[jnp.clip(blk0, 0, N - 1)], 0, nb - 1)
    home = jnp.where(ok, k, t_home).astype(jnp.int32)
    return jnp.where(ok, q_src, t_src), home


def _prefix_excl(x, P: int):
    """Exact exclusive prefix sum of a 0/1 f32 vector (P,) via triangular
    matmuls (Mosaic has no cumsum; integer-exact needs HIGHEST -- one bf16
    MXU pass drops bits past 256).  Measured in the round-4 residency
    rig (scripts/residency_grid_bench*.py)."""
    R = P // 128
    X = x.reshape(R, 128)
    i_id = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j_id = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = (i_id <= j_id).astype(jnp.float32)
    hdot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    row_c = hdot(X, tri)                     # (R, 128) inclusive in-row
    row_tot = row_c[:, 127]
    ir = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    triR = (ir < jr).astype(jnp.float32)
    off = hdot(row_tot[None, :], triR)[0]    # (R,) exclusive row offsets
    return (row_c + off[:, None]).reshape(P) - x


def _kernel3d(g: Grid, max_streak, P, nbx, nby, nbz, resident, vbc_mark,
              residency, out_cap, dep_terms,
              w0_ref,   # scalar prefetch: (nblocks,) chart starts (lanes)
              nl_ref,   # scalar prefetch: (nblocks,) live-lane counts
              qd2_ref,  # scalar prefetch: (nblocks,) per-block qdt_2mc
              qsp_ref,  # scalar prefetch: (nblocks,) per-block charge
              pk_ref,   # (9, P) packed lane state (see 2-D kernel)
              tab_ref, acc_in_ref,
              opk_ref,  # (8|9, P) packed outputs (9 rows when residency:
              #           row 8 = emitted-to-outbox mark)
              acc_ref, oow_ref, *rest):
    """Brick-chart 3-D push with the 2-D kernel's factorized one-hot
    scheme: a chart cell loc = h*128 + l splits into digits, the gather /
    deposit contract against the (P, 128) lo one-hot on the MXU and the
    hi digit is applied as a cheap select -- the dense (P, 1024) one-hot
    materialization this replaces was the dominant VPU cost.  Tables and
    accumulator ride the h-major row layout tab3[(chart_h)*24 + r, l]
    (chart_h = global 128-lane group index), so a chart is a 8*24-row
    sublane slice.  All species share ONE launch (species-pure blocks
    carry q/m via scalar prefetch) and lane state crosses as one packed
    matrix -- see ops/pallas_push.py for the rationale."""
    if residency:
        obx_ref, ores_ref = rest[0], rest[1]
        tab_sem, acc_sem, tab_scratch, acc_scratch = rest[2:]
    else:
        obx_ref = ores_ref = None
        tab_sem, acc_sem, tab_scratch, acc_scratch = rest
    B, HAL, C, S, used = chart_dims(g)
    V = S
    H = V // 128
    bnum = pl.program_id(0)
    w0 = pl.multiple_of(w0_ref[bnum], S)
    s24 = pl.multiple_of((w0 // 128) * 24, 8)
    s16 = pl.multiple_of((w0 // 128) * 16, 8)

    qdt_2mc = qd2_ref[bnum]
    qsp = qsp_ref[bnum]
    cdt = (g.cvac * g.dt * g.rdx, g.cvac * g.dt * g.rdy,
           g.cvac * g.dt * g.rdz)

    if resident:
        # whole chart tables live in VMEM for the kernel's duration: one
        # copy-in at block 0 and one copy-out at the last block replace
        # the per-block HBM accumulator RMW (see the 2-D kernel)
        @pl.when(bnum == 0)
        def _():
            oow_ref[0, 0] = 0
            if residency:
                ores_ref[0, 0] = 0
            tdma = pltpu.make_async_copy(tab_ref, tab_scratch, tab_sem)
            adma = pltpu.make_async_copy(acc_ref, acc_scratch, acc_sem)
            tdma.start()
            adma.start()
            tdma.wait()
            adma.wait()
    else:
        @pl.when(bnum == 0)
        def _():
            oow_ref[0, 0] = 0
            if residency:
                ores_ref[0, 0] = 0

    # Dead-block skip (whole-dead blocks = empty bricks' pad regions)
    nl = nl_ref[bnum]

    @pl.when(nl == 0)
    def _passthrough():
        opk_ref[0:7, :] = pk_ref[0:7, :]
        opk_ref[7, :] = jnp.zeros((P,), jnp.float32)
        if residency:
            opk_ref[8, :] = jnp.zeros((P,), jnp.float32)
            obx_ref[:, :] = jnp.zeros((9, out_cap), jnp.float32)

    @pl.when(nl > 0)
    def _live_body():
      if not resident:
        tdma = pltpu.make_async_copy(tab_ref.at[pl.ds(s24, 24 * H), :],
                                     tab_scratch, tab_sem)
        tdma.start()
        adma_in = pltpu.make_async_copy(acc_ref.at[pl.ds(s16, 16 * H), :],
                                        acc_scratch, acc_sem)
        adma_in.start()
        tdma.wait()

      dx = pk_ref[0, :]
      dy = pk_ref[1, :]
      dz = pk_ref[2, :]
      vox = pk_ref[3, :].astype(jnp.int32)   # value-encoded (< 2^24)
      ux = pk_ref[4, :]
      uy = pk_ref[5, :]
      uz = pk_ref[6, :]
      w = pk_ref[7, :]
      live = pk_ref[8, :] > 0.5

      lane_r = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 1)
      iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, P), 0)
      # canonical -> chart-local relative to this block's brick; periodic
      # axes wrap to the nearest image so edge-brick halos resolve
      brick = w0 // S
      BX = brick - nbx * (brick // nbx)
      BY = (brick // nbx) - nby * (brick // (nbx * nby))
      BZ = brick // (nbx * nby)
      gz = vox // g.sz
      r = vox - gz * g.sz
      gy = r // g.sy
      gx = r - gy * g.sy

      def rel(gc, bcoord, ax):
          # chart-local: interior cell i of the brick lands at HAL + i
          # (halo-1 aligns with the canonical +1 ghost offset)
          lr = gc - bcoord * B[ax] + (HAL[ax] - 1)
          n_ax = (g.nx, g.ny, g.nz)[ax]
          if (_eff_bc(g, ax, -1) == P_PERIODIC and g.topology[ax] == 1
                  and C[ax] > 1):
              # Wrap to the nearest image ONLY when already outside the
              # chart range [0, C) AND the wrapped value is inside it --
              # unambiguous whenever n_ax >= C (supports3d enforces it).
              lr = jnp.where((lr >= C[ax]) & (lr - n_ax >= 0),
                             lr - n_ax, lr)
              lr = jnp.where((lr < 0) & (lr + n_ax < C[ax]),
                             lr + n_ax, lr)
          return lr

      lx = rel(gx, BX, 0)
      ly = rel(gy, BY, 1)
      lz = rel(gz, BZ, 2)
      in_chart = (live & (lx >= 0) & (lx < C[0]) & (ly >= 0) & (ly < C[1])
                  & (lz >= 0) & (lz < C[2]))
      loc = lx + C[0] * (ly + C[1] * lz)

      safe = in_chart
      loc0 = jnp.where(safe, loc, -1)
      # invalid lanes encode as -1 (never matches lane_r in [0,128)) --
      # reshaping the int32 avoids the i1 minor-dim insert Mosaic rejects
      lo0 = jnp.where(loc0 >= 0, loc0 & 127, -1)[:, None]
      oh_lo0 = (lane_r == lo0).astype(jnp.bfloat16)
      ohhi0 = (iota_h == (loc0 // 128)[None, :]).astype(jnp.float32)

      if resident:
          tab_win = tab_scratch[pl.ds(s24, 24 * H), :]
      else:
          tab_win = tab_scratch[:, :]
      G2 = _hilo_dot(tab_win, oh_lo0, ((1,), (1,)))      # (24H, P)
      rows = G2[0:24] * ohhi0[0]
      for h in range(1, H):
          rows = rows + G2[24 * h:24 * (h + 1)] * ohhi0[h]

      hax = qdt_2mc * ((rows[0] + dy * rows[1])
                       + dz * (rows[2] + dy * rows[3]))
      hay = qdt_2mc * ((rows[4] + dz * rows[5])
                       + dx * (rows[6] + dz * rows[7]))
      haz = qdt_2mc * ((rows[8] + dx * rows[9])
                       + dy * (rows[10] + dx * rows[11]))
      cbx = rows[12] + dx * rows[13]
      cby = rows[14] + dy * rows[15]
      cbz = rows[16] + dz * rows[17]

      ux = ux + hax
      uy = uy + hay
      uz = uz + haz
      v0 = qdt_2mc * jax.lax.rsqrt(1.0 + (ux * ux + (uy * uy + uz * uz)))
      v1 = cbx * cbx + (cby * cby + cbz * cbz)
      v2 = (v0 * v0) * v1
      v3 = v0 * (1.0 + v2 * (ONE_THIRD + v2 * TWO_FIFTEENTHS))
      v4 = v3 / (1.0 + v1 * (v3 * v3))
      v4 = v4 + v4
      t0 = ux + v3 * (uy * cbz - uz * cby)
      t1 = uy + v3 * (uz * cbx - ux * cbz)
      t2 = uz + v3 * (ux * cby - uy * cbx)
      ux = ux + v4 * (t1 * cbz - t2 * cby)
      uy = uy + v4 * (t2 * cbx - t0 * cbz)
      uz = uz + v4 * (t0 * cby - t1 * cbx)
      ux = ux + hax
      uy = uy + hay
      uz = uz + haz

      rg = jax.lax.rsqrt(1.0 + (ux * ux + (uy * uy + uz * uz)))
      dpx = ux * cdt[0] * rg
      dpy = uy * cdt[1] * rg
      dpz = uz * cdt[2] * rg

      # Pre-flag (before ANY deposit); frozen lanes go to the exact
      # outlier pass: chart exits from the outer shell, and absorbing/
      # custom/remote global-wall crossings.  Periodic needs nothing
      # (halo IS the wrapped copy); reflect bounces in the walk below.
      eps = 1e-5
      flag = jnp.zeros_like(safe)
      for ax, (lcoord, gcoord, pos, dp, n_ax) in enumerate((
              (lx, gx, dx, dpx, g.nx), (ly, gy, dy, dpy, g.ny),
              (lz, gz, dz, dpz, g.nz))):
          p_new = pos + 2.0 * dp
          below = p_new < -1.0 + eps
          above = p_new > 1.0 - eps
          refl_lo = _eff_bc(g, ax, -1) == REFLECT_PARTICLES
          refl_hi = _eff_bc(g, ax, 1) == REFLECT_PARTICLES
          Ca = (C[0], C[1], C[2])[ax]
          if Ca == 1:
              continue      # degenerate axis (2-D z): wraps in place
          exit_lo = below & (lcoord == 0) & ~(
              jnp.full_like(below, refl_lo) & (gcoord == 1))
          exit_hi = above & (lcoord == Ca - 1) & ~(
              jnp.full_like(above, refl_hi) & (gcoord == n_ax))
          flag = flag | exit_lo | exit_hi
          for side, out_m in ((-1, below), (1, above)):
              bc = _eff_bc(g, ax, side)
              if bc in (P_PERIODIC, REFLECT_PARTICLES):
                  continue
              edge = 1 if side < 0 else n_ax
              flag = flag | ((gcoord == edge) & out_m)
      if vbc_mark:
          # Interior per-voxel BC surfaces: table row 18 carries a 0/1
          # 'cell has a custom face' mask (gathered for free by the same
          # one-hot contraction as the field rows, like the 2-D window
          # kernel); any marked-cell lane that would exit its cell is
          # frozen for the exact outlier replay, which applies the
          # per-face code (reflect/absorb/handler).
          beyond_any = jnp.zeros_like(safe)
          for pos, dp in ((dx, dpx), (dy, dpy), (dz, dpz)):
              p_new = pos + 2.0 * dp
              beyond_any = beyond_any | (p_new < -1.0 + eps) \
                  | (p_new > 1.0 - eps)
          flag = flag | ((rows[18] > 0.5) & beyond_any)
      safe = safe & ~flag
      entry_flag = live & ~safe

      q0 = jnp.where(safe, qsp * w, 0.0)
      active = safe
      if not resident:
          adma_in.wait()

      px, py, pz = dx, dy, dz
      lcs = [lx, ly, lz]
      gcs = [gx, gy, gz]
      for round_idx in range(max_streak):
          dirx = jnp.where(dpx > 0, 1.0, -1.0)
          diry = jnp.where(dpy > 0, 1.0, -1.0)
          dirz = jnp.where(dpz > 0, 1.0, -1.0)
          s0 = jnp.where(dpx == 0, BIG,
                         (dirx - px) / jnp.where(dpx == 0, 1, dpx))
          s1 = jnp.where(dpy == 0, BIG,
                         (diry - py) / jnp.where(dpy == 0, 1, dpy))
          s2 = jnp.where(dpz == 0, BIG,
                         (dirz - pz) / jnp.where(dpz == 0, 1, dpz))
          v3w = jnp.full_like(s0, 2.0)
          axis = jnp.full_like(lx, 3)
          for k, sk in enumerate((s0, s1, s2)):
              tk = sk < v3w
              v3w = jnp.where(tk, sk, v3w)
              axis = jnp.where(tk, k, axis)
          frac = 0.5 * v3w
          sdx = dpx * frac
          sdy = dpy * frac
          sdz = dpz * frac
          midx = px + sdx
          midy = py + sdy
          midz = pz + sdz

          qa = jnp.where(active, q0, 0.0)
          v5 = qa * sdx * sdy * sdz * ONE_THIRD

          def quad(qu, dY, dZ):
              a1 = qu * dY
              a0 = qu - a1
              a1 = a1 + qu
              c = 1.0 + dZ
              a2 = a0 * c
              a3 = a1 * c
              d = 1.0 - dZ
              return (a0 * d + v5, a1 * d - v5, a2 - v5, a3 + v5)

          jxs = quad(qa * sdx, midy, midz)
          jys = quad(qa * sdy, midz, midx)
          jzs = quad(qa * sdz, midx, midy)
          zero4 = (jnp.zeros_like(sdx),) * 4
          vals = jnp.stack(jxs + jys + jzs + zero4, axis=0)   # (16, P)

          loc_cur = lcs[0] + C[0] * (lcs[1] + C[1] * lcs[2])

          def deposit(vals=vals, loc_cur=loc_cur, active=active,
                      reuse=None):
              if reuse is None:
                  okw = (loc_cur >= 0) & (loc_cur < V)
                  lo = jnp.where(okw, loc_cur & 127, -1)[:, None]
                  oh_lo = (lane_r == lo).astype(jnp.bfloat16)
                  ohhi = (iota_h == (loc_cur // 128)[None, :]).astype(
                      jnp.float32)
              else:
                  oh_lo, ohhi = reuse
              # bf16 split of vals BEFORE the h-expansion (see the 2-D
              # kernel): 2 terms ~2^-18 relative per deposit (matches the
              # gather's 2-term hilo floor, the deck default), 3 terms
              # ~2^-27 (better than f32); bf16-only expanded tensors
              v_hi = vals.astype(jnp.bfloat16)
              r1 = vals - v_hi.astype(jnp.float32)
              ohhi_b = ohhi.astype(jnp.bfloat16)
              dot = functools.partial(
                  jax.lax.dot_general,
                  dimension_numbers=((((1,), (0,))), ((), ())),
                  preferred_element_type=jnp.float32)
              expand = lambda vt: (ohhi_b[:, None, :]
                                   * vt[None, :, :]).reshape(16 * H, P)
              upd = dot(expand(v_hi), oh_lo)
              if dep_terms >= 3:
                  v_mid = r1.astype(jnp.bfloat16)
                  v_lo = (r1 - v_mid.astype(jnp.float32)).astype(
                      jnp.bfloat16)
                  upd = (upd + dot(expand(v_mid), oh_lo)
                         + dot(expand(v_lo), oh_lo))      # (16H, 128)
              else:
                  upd = upd + dot(expand(r1.astype(jnp.bfloat16)), oh_lo)
              if resident:
                  acc_scratch[pl.ds(s16, 16 * H), :] += upd
              else:
                  acc_scratch[:, :] += upd
              oow_ref[0, 0] += jnp.sum(jnp.where(
                  active & ((loc_cur < 0) | (loc_cur >= V)), 1, 0))

          if round_idx == 0:
              deposit(reuse=(oh_lo0, ohhi0))
          else:
              pl.when(jnp.any(active))(deposit)

          upd_ = lambda o, n: jnp.where(active, n, o)
          dpx = upd_(dpx, dpx - sdx)
          dpy = upd_(dpy, dpy - sdy)
          dpz = upd_(dpz, dpz - sdz)
          px = upd_(px, px + sdx + sdx)
          py = upd_(py, py + sdy + sdy)
          pz = upd_(pz, pz + sdz + sdz)

          ended = axis == 3
          crossing = active & ~ended
          active = crossing

          for ax in range(3):
              m = crossing & (axis == ax)
              pp = (px, py, pz)[ax]
              dd = (dirx, diry, dirz)[ax]
              pn = jnp.where(m, dd, pp)
              if ax == 0:
                  px = pn
              elif ax == 1:
                  py = pn
              else:
                  pz = pn

          # Face handling: reflect at global walls bounces in place; other
          # crossings move one chart cell (chart exits and non-reflect
          # walls were pre-flagged; stray ULP cases park at the face).
          for ax in range(3):
              m = crossing & (axis == ax)
              n_ax = (g.nx, g.ny, g.nz)[ax]
              Ca = (C[0], C[1], C[2])[ax]
              d = (dirx, diry, dirz)[ax]
              up = d > 0
              if Ca == 1:
                  # degenerate axis (2-D z, single periodic plane): the
                  # ghost cell IS the real cell -- cross into the same
                  # cell from the opposite face
                  if ax == 2:
                      pz = jnp.where(m, -pz, pz)
                  continue
              lc = lcs[ax]
              gc = gcs[ax]
              refl_lo = _eff_bc(g, ax, -1) == REFLECT_PARTICLES
              refl_hi = _eff_bc(g, ax, 1) == REFLECT_PARTICLES
              bounce = m & ((jnp.full_like(m, refl_lo) & ~up & (gc == 1))
                            | (jnp.full_like(m, refl_hi) & up
                               & (gc == n_ax)))
              newl = jnp.where(up, lc + 1, lc - 1)
              exit_chart = m & ~bounce & ((newl < 0) | (newl > Ca - 1))
              move = m & ~bounce & ~exit_chart
              step1 = jnp.where(up, 1, -1)
              lcs[ax] = jnp.where(move, lc + step1, lc)
              gcs[ax] = jnp.where(move, gc + step1, gc)
              if ax == 0:
                  px = jnp.where(move, -px, px)
                  ux = jnp.where(bounce, -ux, ux)
                  dpx = jnp.where(bounce, -dpx,
                                  jnp.where(exit_chart, 0.0, dpx))
              elif ax == 1:
                  py = jnp.where(move, -py, py)
                  uy = jnp.where(bounce, -uy, uy)
                  dpy = jnp.where(bounce, -dpy,
                                  jnp.where(exit_chart, 0.0, dpy))
              else:
                  pz = jnp.where(move, -pz, pz)
                  uz = jnp.where(bounce, -uz, uz)
                  dpz = jnp.where(bounce, -dpz,
                                  jnp.where(exit_chart, 0.0, dpz))

      if not resident:
          adma_out = pltpu.make_async_copy(
              acc_scratch, acc_ref.at[pl.ds(s16, 16 * H), :], acc_sem)
          adma_out.start()
          adma_out.wait()

      # write back canonical voxel (wrap periodic axes; non-periodic walks
      # cannot leave [1, n] by construction)
      gxn, gyn, gzn = gcs
      if _eff_bc(g, 0, -1) == P_PERIODIC and g.topology[0] == 1:
          gxn = (gxn - 1) % g.nx + 1
      if _eff_bc(g, 1, -1) == P_PERIODIC and g.topology[1] == 1:
          gyn = (gyn - 1) % g.ny + 1
      if _eff_bc(g, 2, -1) == P_PERIODIC and g.topology[2] == 1:
          gzn = (gzn - 1) % g.nz + 1
      vox_new = gxn + g.NX * (gyn + g.NY * gzn)
      opk_ref[0, :] = jnp.where(safe, px, dx)
      opk_ref[1, :] = jnp.where(safe, py, dy)
      opk_ref[2, :] = jnp.where(safe, pz, dz)
      opk_ref[3, :] = jnp.where(safe, vox_new, vox).astype(jnp.float32)
      opk_ref[4, :] = jnp.where(safe, ux, pk_ref[4, :])
      opk_ref[5, :] = jnp.where(safe, uy, pk_ref[5, :])
      opk_ref[6, :] = jnp.where(safe, uz, pk_ref[6, :])
      opk_ref[7, :] = jnp.where(entry_flag, 1.0, 0.0)

      if residency:
          # Residency bookkeeping: any pushed lane whose FINAL cell left
          # the brick interior (i.e. sits in the halo) is a brick-leaver.
          # Up to out_cap leavers are copied compactly into this block's
          # outbox tile (exact f32-HIGHEST one-hot dot; the one nonzero
          # term per column makes the move bit-exact) and marked emitted
          # in opk row 8 -- ops/residency.merge_p drops the marks and
          # inserts the routed copies at their destination bricks.
          # Leavers past out_cap simply stay resident (the halo tolerates
          # them for another step) and are counted in ores for the
          # rebucket trigger.
          interior = safe
          for ax in range(3):
              if C[ax] == 1:
                  continue
              interior = (interior & (lcs[ax] >= HAL[ax])
                          & (lcs[ax] < HAL[ax] + B[ax]))
          leave = safe & ~interior
          lf = leave.astype(jnp.float32)
          posl = _prefix_excl(lf, P)
          emit = leave & (posl < float(out_cap))
          ores_ref[0, 0] += jnp.sum(
              jnp.where(leave & ~emit, 1, 0))
          tgt = jnp.where(emit, posl, -1.0)
          colr = jax.lax.broadcasted_iota(
              jnp.int32, (P, out_cap), 1).astype(jnp.float32)
          oh = (tgt[:, None] == colr).astype(jnp.float32)
          Xo = jnp.stack(
              [jnp.where(safe, px, dx), jnp.where(safe, py, dy),
               jnp.where(safe, pz, dz),
               jnp.where(safe, vox_new, vox).astype(jnp.float32),
               jnp.where(safe, ux, pk_ref[4, :]),
               jnp.where(safe, uy, pk_ref[5, :]),
               jnp.where(safe, uz, pk_ref[6, :]), w], axis=0)
          obx_ref[0:8, :] = jax.lax.dot_general(
              Xo, oh, dimension_numbers=(((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.HIGHEST)
          nem = jnp.sum(emit.astype(jnp.float32))
          obx_ref[8, :] = (jax.lax.broadcasted_iota(
              jnp.int32, (1, out_cap), 1).astype(jnp.float32)
              < nem).astype(jnp.float32)[0]
          opk_ref[8, :] = emit.astype(jnp.float32)

    if resident:
        @pl.when(bnum == pl.num_programs(0) - 1)
        def _():
            adma_out = pltpu.make_async_copy(acc_scratch, acc_ref, acc_sem)
            adma_out.start()
            adma_out.wait()


@functools.partial(jax.jit, static_argnames=("g", "qsps", "msps",
                                             "max_streak", "block",
                                             "vbc_mark", "residency",
                                             "out_cap", "dep_terms"))
def _run3d(sps, tab_chart, acc_chart, g: Grid, qsps, msps,
           max_streak=4, block=1024, homes=None, vbc_mark=False,
           residency=False, out_cap=128, dep_terms=3):
    """All species through ONE 3-D kernel launch: block-aligned species
    segments concatenated, per-block q/m via scalar prefetch, lane state
    packed (see ops/pallas_push._run).  Table and accumulator are
    relayouted h-major (chart_h*rows + r, 128) outside the kernel so a
    chart is a contiguous sublane slice for streamed windows.

    ``homes`` (one (capacity // block,) map per species, from
    brick_sort_p_home) pins each block to the brick the LAST SORT placed
    it in -- exact, drift-proof.  Without it the home is re-derived from
    current lane positions (9-quantile majority): fine when sorting every
    step, but a collectively-drifting block mid-sort-cycle flips its
    majority to the neighbor brick and ~half its lanes flood the outlier
    pass, so deck-driven multi-step-cycle runs must pass homes."""
    sps = tuple(sps)
    nbx, nby, nbz = _nb(g)
    nvp = tab_chart.shape[1]
    S = chart_dims(g)[3]
    H = S // 128
    nvh = nvp // 128
    # block is pinned to the sort quantum (1024); resident chart tables
    # when they + the factorized transients fit VMEM
    from .pallas_push import RESIDENT_VMEM_BUDGET
    tabs = (24 + 16) * nvp * 4
    trans = block * (264 * H + 648)
    resident = (tabs <= RESIDENT_VMEM_BUDGET
                and tabs + trans <= (14 << 20))

    cols = {k: [] for k in ("dx", "dy", "dz", "vox", "ux", "uy", "uz",
                            "w", "live")}
    w0s, nls, qd2s, qws, Nps = [], [], [], [], []
    if homes is None:
        homes = (None,) * len(sps)
    for sp, qsp, msp, home_in in zip(sps, qsps, msps, homes):
        N = sp.capacity
        Np = _round_up(N, block)
        Nps.append(Np)
        nb = Np // block
        pad = lambda a: jnp.pad(a, (0, Np - N))
        vox = pad(sp.i)
        live = pad(sp.live.astype(jnp.int32))
        cols["dx"].append(pad(sp.dx))
        cols["dy"].append(pad(sp.dy))
        cols["dz"].append(pad(sp.dz))
        cols["vox"].append(vox.astype(jnp.float32))
        cols["ux"].append(pad(sp.ux))
        cols["uy"].append(pad(sp.uy))
        cols["uz"].append(pad(sp.uz))
        cols["w"].append(pad(sp.w))
        cols["live"].append(live.astype(jnp.float32))

        livb = live.reshape(nb, block)
        nlive = jnp.sum(livb, axis=1)
        if home_in is not None:
            # sticky sort-time assignment (see docstring); pad blocks past
            # capacity (Np > N) are dead and clip to the last brick
            home = jnp.pad(home_in, (0, nb - home_in.shape[0]),
                           constant_values=0)
        else:
            # fallback: majority brick from 9 quantile-sampled live lanes
            # (a single median lane is a random block member; the sorted
            # median-of-9 is within one brick of every lane, so the halo
            # covers one step of drift)
            vb = vox.reshape(nb, block)
            fr = jnp.asarray([(2 * j + 1) / 18.0 for j in range(9)],
                             jnp.float32)
            idxs = jnp.clip(
                (nlive[:, None] * fr[None, :]).astype(jnp.int32),
                0, block - 1)                            # (nb, 9)
            samp = jnp.take_along_axis(vb, idxs, 1)      # sampled voxels
            home = jnp.sort(brick_of(samp, g), axis=1)[:, 4]
        w0s.append(jnp.clip(home * S, 0, nvp - S))
        nls.append(nlive)
        qd2s.append(jnp.full((nb,), (qsp * g.dt) / (2.0 * msp * g.cvac),
                             jnp.float32))
        qws.append(jnp.full((nb,), qsp, jnp.float32))

    cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs)
    order = ("dx", "dy", "dz", "vox", "ux", "uy", "uz", "w", "live")
    pk = jnp.stack([cat(cols[k]) for k in order])       # (9, Ntot)
    w0, nlive = cat(w0s), cat(nls)
    qd2, qw = cat(qd2s), cat(qws)
    Ntot = sum(Nps)
    nblocks = Ntot // block

    # h-major row layouts (see ops/pallas_push._run)
    tab3 = tab_chart.reshape(24, nvh, 128).transpose(1, 0, 2).reshape(
        nvh * 24, 128)
    acc3 = acc_chart.reshape(16, nvh, 128).transpose(1, 0, 2).reshape(
        nvh * 16, 128)

    nrow = 9 if residency else 8
    out_specs = [pl.BlockSpec((nrow, block), lambda b, *_: (0, b)),
                 pl.BlockSpec(memory_space=pl.ANY),
                 pl.BlockSpec((1, 1), lambda b, *_: (0, 0),
                              memory_space=pltpu.SMEM)]
    out_shapes = [jax.ShapeDtypeStruct((nrow, Ntot), jnp.float32),
                  jax.ShapeDtypeStruct((nvh * 16, 128), jnp.float32),
                  jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    if residency:
        out_specs += [pl.BlockSpec((9, out_cap), lambda b, *_: (0, b)),
                      pl.BlockSpec((1, 1), lambda b, *_: (0, 0),
                                   memory_space=pltpu.SMEM)]
        out_shapes += [jax.ShapeDtypeStruct((9, nblocks * out_cap),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((9, block), lambda b, *_: (0, b))]
        + [pl.BlockSpec(memory_space=pl.ANY),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                        pltpu.VMEM((nvh * 24 if resident else 24 * H, 128),
                                   jnp.float32),
                        pltpu.VMEM((nvh * 16 if resident else 16 * H, 128),
                                   jnp.float32)],
    )
    kernel = functools.partial(_kernel3d, g, max_streak, block,
                               nbx, nby, nbz, resident, vbc_mark,
                               residency, out_cap, dep_terms)
    interpret = jax.devices()[0].platform != "tpu"
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        input_output_aliases={6: 1},
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(w0, nlive, qd2, qw, pk, tab3, acc3)

    if residency:
        (opk, acc3_out, oow, obx, ores) = outs
    else:
        (opk, acc3_out, oow) = outs
    acc_out = acc3_out.reshape(nvh, 16, 128).transpose(1, 0, 2).reshape(
        16, nvp)
    ovox_all = opk[3].astype(jnp.int32)
    new_sps, oflags, emits, off = [], [], [], 0
    for sp, Np in zip(sps, Nps):
        N = sp.capacity
        sl = slice(off, off + N)
        new_sps.append(sp.replace(
            dx=opk[0, sl], dy=opk[1, sl], dz=opk[2, sl],
            i=jnp.where(sp.live, ovox_all[sl], sp.i),
            ux=opk[4, sl], uy=opk[5, sl], uz=opk[6, sl]))
        oflags.append((opk[7, sl] > 0.5).astype(jnp.int32))
        if residency:
            emits.append(opk[8, sl])
        off += Np
    if residency:
        return new_sps, acc_out, oflags, oow[0, 0], emits, obx, ores[0, 0]
    return new_sps, acc_out, oflags, oow[0, 0]


def fused_push3d(sp: SpeciesState, tab_chart, acc_chart, g: Grid,
                 qsp: float, msp: float, max_streak: int = 4,
                 block: int = 1024):
    """One species push through the 3-D brick-chart kernel (canonical
    voxel indices in and out).  Returns (species, acc_chart, oflag, oow)."""
    sps, acc, oflags, oow = _run3d((sp,), tab_chart, acc_chart, g,
                                   (float(qsp),), (float(msp),),
                                   max_streak, block)
    return sps[0], acc, oflags[0], oow


def fused_push3d_multi(sps, tab_chart, acc_chart, g: Grid, qms,
                       max_streak: int = 4, block: int = 1024,
                       homes=None, vbc_mark: bool = False,
                       residency: bool = False, out_cap: int = 128,
                       dep_terms: int = 3):
    """All species through ONE 3-D brick-chart launch; ``qms`` is a
    sequence of (charge, mass), ``homes`` the per-species sort-time block
    maps (brick_sort_p_home), ``vbc_mark`` whether table row 18 carries
    the interior per-voxel-BC cell mask.  Returns (species_list,
    acc_chart, oflag_list, oow); with ``residency`` additionally
    (emit_rows, outbox, n_uncapped) -- see ops/residency."""
    return _run3d(tuple(sps), tab_chart, acc_chart, g,
                  tuple(float(q) for q, _ in qms),
                  tuple(float(m) for _, m in qms),
                  max_streak, block, homes=homes, vbc_mark=vbc_mark,
                  residency=residency, out_cap=out_cap,
                  dep_terms=dep_terms)
