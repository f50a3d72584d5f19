"""Fused Pallas advance_p kernel: interpolate -> Boris -> streak-walk ->
current deposition in ONE TPU kernel.

This is the production hot path (SURVEY 7: "the make-or-break kernel").
Design, replacing both the reference's SIMD pipelines and the XLA
gather/scatter path in ops/push.py:

* Particles are kept voxel-sorted (sort_p each step on this path), so each
  P-particle block touches a narrow voxel window [w0, w0 + V).  The window
  start per block is scalar-prefetched.
* The interpolation table is stored transposed (18, nv) so the voxel axis
  is the TPU lane dimension; the whole table lives in VMEM across the grid
  (it is ~1 MB at production 2-D resolutions).
* Field gather and current scatter both become MXU one-hot matmuls inside
  the window: rows(18,P) = table[:, w0:w0+V] @ onehot(P,V)^T and
  acc[:, w0:w0+V] += vals(12,P) @ onehot(P,V).  One-hot entries are exact
  in bf16, so each f32 operand is split hi+lo into two bf16 matmuls whose
  f32-accumulated sum reproduces the f32 product to ~2^-18 relative (vs
  2^-24 for full f32 at 3x the MXU passes) -- conflict-free deposition by
  construction, which is what the reference buys with per-thread
  accumulator replicas.  Streak rounds after the first only run their
  deposit matmuls when some lane actually crossed a cell boundary
  (pl.when), so the common straight-line push pays ONE deposit matmul.
* The 4-round streak walk runs on (P,) VPU vectors inside the kernel with
  periodic / reflecting faces handled as masked lanes.
* Periodic faces never leave the window (nz == 1): x exits re-map in-kernel
  (a +-nx linear jump); y walks UNWRAPPED -- since particles only ever
  occupy the z=1 plane third of the linear index space, the z=0 / z=2
  thirds hold periodic y-IMAGE columns (rows y_u = r - NY and r + NY), so
  a walk past the y ghost layer just flows into the adjacent third.
  fold_ghost_acc_T folds image deposits onto their canonical rows and
  remap_ghost_voxels decodes image residents (at sort time).

* Absorbing / custom particle-BC faces (and emitter/injection decks) stay
  on the fused path: the kernel pre-flags lanes that would cross such a
  face BEFORE any deposit (exact under CFL: edge cell + final position)
  and freezes them untouched; the compact XLA outlier pass replays them
  with full boundary semantics (absorb+rhob, tallies, custom handlers).

Scope guard (falls back to ops/push.advance_p otherwise): nz == 1
(linear-index windows only work when crossings move the voxel by +-1 or
+-NX) and paired periodic faces; sharded grids run this kernel per shard
with remote crossers pre-flagged like walls.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import P_PERIODIC, P_REMOTE, REFLECT_PARTICLES, Grid
from ..state import SpeciesState
from .push import (BIG, ONE_THIRD, TWO_FIFTEENTHS, PushResult,
                   div_const as _div_const, sort_p)

DEF_BLOCK = 1024     # particles per kernel invocation (1-D f32 XLA tile)
DEF_WINDOW = 1024    # voxel window (lanes); multiple of 128
RESIDENT_VMEM_BUDGET = 11 << 20   # bytes of VMEM the tables may occupy


def _eff_bc(g: Grid, ax: int, side: int) -> int:
    """Per-axis particle BC as the kernel must treat it: any device-mesh-
    sharded axis is a remote 'wall' (crossers pre-flagged; the deck-level
    boundary_p applies the real edge BC or migrates), regardless of the
    global-domain BC stored on the face.  A face spliced by join_domain
    (per-face partner tables) is likewise remote: per-rank joinedness is
    traced data the kernel's static pre-flag cannot branch on, but
    pre-flagging ALL crossers of a joined face lets the exact XLA outlier
    pass route them with the general path's per-rank logic
    (grid/ops.c:119-212)."""
    if g.topology[ax] > 1:
        return P_REMOTE
    if g.face_partners is not None:
        face = ax + (0 if side < 0 else 3)
        if any(v >= 0 for v in g.face_partners[face]):
            return P_REMOTE
    return g.axis_bc(ax, side, particles=True)


def supports(g: Grid, max_capacity: int = 0) -> bool:
    """Can the fused kernel run this grid (per shard)?  Periodic/reflect
    faces are handled in-kernel; absorbing, custom-BC, and cross-shard
    remote faces are allowed because would-be crossers are pre-flagged and
    replayed by the exact XLA outlier pass (the deck routes remote/custom
    pends to boundary_p).  Only 3-D grids fall back to the general path."""
    if g.nz != 1:
        return False
    for axis in range(3):
        # periodic must pair up (the in-kernel wrap / unwrapped-y image
        # schemes assume a periodic partner face)
        if ((_eff_bc(g, axis, -1) == P_PERIODIC)
                != (_eff_bc(g, axis, 1) == P_PERIODIC)):
            return False
    # capacity: sort keys/sources are int32 through lax.sort (exact),
    # so only the int32 index space bounds N (the old 2^24 limit guarded
    # the retired f32 counting-sort destinations); voxel indices ride the
    # packed kernel IO value-encoded in f32, bounding nv at 2^24
    if max_capacity and max_capacity >= (1 << 30):
        return False
    return 256 <= g.nv < (1 << 24)


def _round_up(x, m):
    return (x + m - 1) // m * m


BUCKET = 128


def _hilo(x):
    """Split f32 into two bf16 terms: x ~= hi + lo to ~2^-18 relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _hilo_dot(x, oh, dims, terms=2):
    """Split-matmul of f32 x against an EXACT bf16 one-hot in `terms`
    full-rate MXU passes (vs 6 for f32 HIGHEST): relative error ~2^-18 at
    terms=2, ~2^-27 (better than f32) at terms=3."""
    d = functools.partial(jax.lax.dot_general,
                          dimension_numbers=(dims, ((), ())),
                          preferred_element_type=jnp.float32)
    hi, lo = _hilo(x)
    out = d(hi, oh)
    if terms == 3:
        rem = x - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        out = out + d(mid, oh)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return out + d(lo, oh)


def guard(g: Grid) -> int:
    """Exact one-step linear-index movement bound for the entry guard:
    one y crossing (+-NX; at most one per axis per step under CFL), one
    x cell move (+-1), an x periodic ghost-exit re-map (+-nx, only when
    x is periodic), +2 alignment/ULP slack.  The old blanket 2*NX charged
    every deck for the x-periodic re-map; reflecting/wall-x decks (harris)
    only ever move NX+1, so their guard -- two of the window's H units --
    halves."""
    xper = _eff_bc(g, 0, -1) == P_PERIODIC
    return g.NX + (g.nx if xper else 0) + 3


def pick_window(g: Grid, sortK: int = 4) -> int:
    """Voxel-window width for the fused kernel: the usable corridor
    (window - 2*guard) must cover a block's bucket-straddle span
    (2*BUCKET) plus the worst inter-sort span growth.  Since w0 is
    re-derived per STEP from each block's live minimum (not per sort),
    only the block's internal span matters -- measured on the bench deck
    it grows ~0.55*NX/step (lanes diverge by at most one y-row per step
    but most don't cross), so (sortK-1)*NX covers the worst block with
    ~2x margin (measured max span at sortK=8: 760 =~ 0.8*(K-1)*NX).
    Under-estimates degrade gracefully: far lanes are entry-flagged and
    replayed exactly by the outlier pass.  The +128 covers w0's
    floor-to-128 alignment."""
    need = 2 * guard(g) + 2 * BUCKET + (sortK - 1) * g.NX + 128
    return max(512, _round_up(min(need, 8192), 128))


def table_width(g: Grid, window: int = DEF_WINDOW) -> int:
    """Padded voxel-axis width for the transposed tables (128-lane tiles;
    at least one full window so the streamed slice stays in bounds)."""
    return max(_round_up(g.nv, 128), window)


def packed_src_sort(b, rows: int, nkeys: int):
    """Stable sort of ``rows`` lanes by small key ``b`` (values < nkeys);
    returns (b_sorted, src) where src is the per-output-slot SOURCE index.
    When (key, slot) packs into 32 bits, sorts ONE uint32 operand
    (key << log2(rows) | slot -- bit-identical to the stable key-value
    sort since the slot suffix breaks ties in slot order): every lax.sort
    operand rides the full sorting network, so dropping the value operand
    nearly halves the sort's data movement."""
    shift = max(rows - 1, 1).bit_length()
    if nkeys << shift <= (1 << 32):
        key = ((b.astype(jnp.uint32) << shift)
               | jax.lax.iota(jnp.uint32, rows))
        key = jax.lax.sort(key)
        return ((key >> shift).astype(jnp.int32),
                (key & ((1 << shift) - 1)).astype(jnp.int32))
    bs, src = jax.lax.sort((b, jax.lax.iota(jnp.int32, rows)), num_keys=1,
                           is_stable=True)
    return bs, src


def bucket_sort_p(sp: SpeciesState, g: Grid, bucket: int = BUCKET,
                  pack: int = 1, extent: int = 0):
    """O(N) stable counting sort by coarse voxel bucket (dead slots last).

    The fused kernel only needs particles grouped within its voxel window,
    not fully ordered, so a coarse counting sort replaces the argsort the
    general sort_p uses -- the TPU re-expression of the reference's
    coarse/fine two-pass sort (sort_p_pipeline.c: coarse histogram ->
    prefix -> scatter).

    The permutation moves PACK consecutive lanes as one row (key = min live
    bucket of the group): row moves pay a flat per-row cost on this chip,
    so pack-4 cuts the dominant gather+scatter ~4x.  Group members sit in
    adjacent buckets after any previous sort, so window margins absorb the
    straddle; a stray member (e.g. a fresh injection into a recycled slot)
    is entry-guard-flagged and replayed exactly by the outlier pass.

    ``extent`` (static) bounds the LIVE slots: when the deck can prove
    live lanes never grow or reorder (no migration/emission/injection/
    collisions -- the deck passes its host-side injection count), only
    the first extent slots are sorted and row-gathered and the dead tail
    streams through untouched.  Row gathers pay a per-row latency floor
    (~6.4 ns/row), so skipping a 1.5x-capacity species' slack is a ~30%
    sort cut; this sort packs live first, so live lanes stay inside the
    extent for every later step."""
    N = sp.capacity
    E = min(_round_up(extent, 1024), N) if extent else N
    while pack > 1 and E % pack:
        pack //= 2
    sl = (lambda a: a[:E]) if E < N else (lambda a: a)
    nb = _round_up(g.nv, bucket) // bucket
    b = jnp.where(sl(sp.live), sl(sp.i) // bucket, nb)
    if pack > 1:
        b = jnp.min(b.reshape(E // pack, pack), axis=1)
    # Per-output-slot SOURCE index from ONE stable sort: measured 2x
    # cheaper than counting-sort destinations + inverse-permutation
    # scatter (2.27 vs 3.37 ms at 196k lanes -- scatters are latency-bound
    # on this chip) and bit-identical (both stable by the same key).
    _, src = packed_src_sort(b, E // pack, nb + 1)

    # Move rows with a GATHER by the per-slot source: on this chip a row
    # gather runs ~16x faster than the equivalent row scatter (80 ms ->
    # 5+5 ms at 786k rows), so movers must always be gathers.
    from .push import gather_sp_rows
    moved = gather_sp_rows(
        src, sl(sp.dx), sl(sp.dy), sl(sp.dz), sl(sp.ux), sl(sp.uy),
        sl(sp.uz), sl(sp.w), sl(sp.i), sl(sp.live), pack=pack)
    if E < N:
        olds = (sp.dx, sp.dy, sp.dz, sp.ux, sp.uy, sp.uz, sp.w, sp.i,
                sp.live)
        moved = tuple(jnp.concatenate([m, o[E:]])
                      for m, o in zip(moved, olds))
    dx, dy, dz, ux, uy, uz, w, i, live = moved
    return sp.replace(dx=dx, dy=dy, dz=dz, ux=ux, uy=uy, uz=uz, w=w,
                      i=i, live=live)


def _kernel(g: Grid, max_streak, P, V, nvp, resident, ablate, vbc_mark,
            dep_terms,
            w0_ref,  # scalar prefetch: (nblocks,) window starts (int32)
            nl_ref,  # scalar prefetch: (nblocks,) live-lane counts (int32)
            qd2_ref,  # scalar prefetch: (nblocks,) per-block qdt_2mc (f32)
            qsp_ref,  # scalar prefetch: (nblocks,) per-block charge (f32)
            pk_ref,   # (9, P) packed lane state: dx dy dz vox* ux uy uz w
                      # live (vox bitcast int32->f32, live as 0.0/1.0);
                      # ONE buffer instead of 9 so the per-block pipeline
                      # issues 2 DMAs, not 17 -- fixed DMA-issue latency,
                      # not bandwidth, set the old per-block floor
            tab_ref, acc_in_ref,
            opk_ref,  # (8, P) packed outputs: dx dy dz vox* ux uy uz flag
            acc_ref, oow_ref, tab_sem, acc_sem, tab_scratch, acc_scratch):
    # FACTORIZED one-hot scheme: a window voxel v - w0 = h*128 + l splits
    # into digits, and onehot(v) = onehot_hi(h) (x) onehot_lo(l).  Gather
    # and deposit contract against the (P, 128) lo one-hot on the MXU
    # (same FLOPs as the dense (P, V) one-hot, perfect 128-lane tiles)
    # while the hi digit is applied as a cheap one-hot select, so the
    # materialized one-hot shrinks from P*V to P*(128+H) elements -- the
    # dense one-hot's VPU materialization, not the matmul, was the
    # dominant kernel cost.  Tables/accumulator use the h-major row
    # layout tabF[hg*24+r, l] / accF[hg*16+r, l] (hg = global hi digit)
    # so a window is a multiple-of-8 sublane slice.
    b = pl.program_id(0)
    H = V // 128
    w0 = pl.multiple_of(w0_ref[b], 128)
    s24 = pl.multiple_of((w0 // 128) * 24, 8)
    s16 = pl.multiple_of((w0 // 128) * 16, 8)

    # Per-block species scalars (blocks are species-pure: the caller pads
    # each species to a block multiple before concatenating) -- this is
    # what lets ALL species ride ONE kernel launch, sharing the table
    # DMA/residency and the per-call prep instead of paying them per
    # species.
    qdt_2mc = qd2_ref[b]
    qsp = qsp_ref[b]
    cdt_dx = g.cvac * g.dt * g.rdx
    cdt_dy = g.cvac * g.dt * g.rdy
    cdt_dz = g.cvac * g.dt * g.rdz

    if resident:
        # Whole table + accumulator live in VMEM scratch for the whole
        # kernel: ONE copy-in at block 0, ONE copy-out at the last block.
        # This removes the per-block HBM accumulator read-modify-write
        # whose DMA latency otherwise serializes the ~N/P grid steps.
        @pl.when(b == 0)
        def _():
            oow_ref[0, 0] = 0
            tdma = pltpu.make_async_copy(tab_ref, tab_scratch, tab_sem)
            adma = pltpu.make_async_copy(acc_ref, acc_scratch, acc_sem)
            tdma.start()
            adma.start()
            tdma.wait()
            adma.wait()
    else:
        @pl.when(b == 0)
        def _():
            oow_ref[0, 0] = 0

    # Dead-block skip: the bucket sort packs dead lanes last, so capacity
    # slack shows up as whole blocks with zero live lanes; they pass their
    # state through and skip all compute + DMA (a ~1.5x-capacity species
    # pays ~the live blocks only).
    nl = nl_ref[b]

    @pl.when(nl == 0)
    def _passthrough():
        opk_ref[0:7, :] = pk_ref[0:7, :]
        opk_ref[7, :] = jnp.zeros((P,), jnp.float32)

    @pl.when(nl > 0)
    def _live_body():
      if not resident:
        # Stream this block's table window from HBM (the whole table can
        # exceed VMEM at large grid sizes).  The accumulator stays in HBM
        # (aliased input/output); each block read-modify-writes only its
        # own voxel window, which is safe because TPU grid steps run
        # sequentially.
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
      # Entry guard: a lane whose voxel cannot stay inside the window for the
      # whole walk is FROZEN (state passes through untouched) and flagged for
      # the caller's compact XLA outlier pass -- stale-sort drift lands here,
      # so the fused path stays exact at any sort interval.  guard(g) is the
      # exact one-step movement bound (y crossing + x move + x re-map when
      # x is periodic).
      GUARD = guard(g)
      loc0 = vox - w0
      safe = live & (loc0 >= GUARD) & (loc0 < V - GUARD)
      entry_flag = live & ~safe
      # w0 is 128-aligned, so lo = loc0 % 128 == vox % 128 for safe lanes
      # NEGATIVE RESULT (round 4, measured): an occupancy-gated per-h
      # scheme (each hi digit under pl.when(lanes present), masked per-h
      # lo one-hots, (24,128)/(16,P) digit-sized dots) benched 45.6 vs
      # 165 M/s -- Mosaic's scalar branches around MXU ops destroy the
      # pipeline; the dense (24H,128) contraction below is 3.6x faster
      # than "half the MACs" behind 40 branches/block.  Do not retry.
      if ablate & 8:
          oh_lo0 = jnp.zeros((P, 128), jnp.bfloat16)
          ohT0 = jnp.zeros((128, P), jnp.bfloat16)
          ohhi0 = jnp.zeros((H, P), jnp.float32)
      else:
          lo0r = jnp.where(safe, loc0 & 127, -1)
          oh_lo0 = (lane_r == lo0r[:, None]).astype(jnp.bfloat16)  # (P, 128)
          # gather one-hot built TRANSPOSED (contraction dim on sublanes)
          # so the dot below is standard (M,K)@(K,N) -- a ((1,),(1,))
          # contraction forces a Mosaic lane<->sublane relayout per block
          ohT0 = (jax.lax.broadcasted_iota(jnp.int32, (128, P), 0)
                  == lo0r[None, :]).astype(jnp.bfloat16)           # (128, P)
          ohhi0 = (iota_h == (loc0 // 128)[None, :]).astype(
              jnp.float32)                                   # (H, P)

      if ablate & 4:
          rows = jnp.zeros((24, P), jnp.float32)
      else:
          if resident:
              tab_win = tab_scratch[pl.ds(s24, 24 * H), :]   # (24H, 128)
          else:
              tab_win = tab_scratch[:, :]
          G2 = _hilo_dot(tab_win, ohT0, ((1,), (0,)))        # (24H, P)
          rows = G2[0:24] * ohhi0[0]
          for h in range(1, H):
              rows = rows + G2[24 * h:24 * (h + 1)] * ohhi0[h]   # (24, P)

      if ablate & 16:
          dpx = dpy = dpz = jnp.zeros_like(dx)
      else:
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
          dpx = ux * cdt_dx * rg
          dpy = uy * cdt_dy * rg
          dpz = uz * cdt_dz * rg

      # Decode voxel coords (nz == 1: z pinned at plane 1).  yi is UNWRAPPED:
      # residents of the y-image ranges (see module docstring) decode to
      # yi < 0 / yi >= NY and vox_cur = xi + NX*(yi + NY) puts them right
      # back; canonical plane-1 voxels give the usual yi in [0, NY).
      vq = _div_const(vox, g.NX, 3 * g.sz)
      yi = vq - g.NY
      xi = vox - g.NX * vq

      # Wall pre-flag: a lane whose step would cross a face whose BC the
      # kernel does not implement (absorb / custom / remote) is frozen
      # UNTOUCHED and flagged; the compact XLA outlier pass replays it with
      # full boundary semantics (rhob deposit, tallies, custom handlers).
      # Under CFL a particle crosses at most one face per axis per step, so
      # the edge-cell + final-position test is exact; the small margin
      # absorbs ULP disagreement with the walk's (dir-p)/dp face test (a
      # missed lane parks at the face and is flagged next step).
      eps = 1e-5
      coords3 = (xi, yi, jnp.ones_like(xi))
      pos3 = (dx, dy, dz)
      dp3 = (dpx, dpy, dpz)
      wall = jnp.zeros_like(safe)
      for ax in range(3):
          n_ax = (g.nx, g.ny, g.nz)[ax]
          for side in (-1, 1):
              if _eff_bc(g, ax, side) in (P_PERIODIC, REFLECT_PARTICLES):
                  continue
              edge = 1 if side < 0 else n_ax
              p_new = pos3[ax] + 2.0 * dp3[ax]
              beyond = (p_new < -1.0 + eps) if side < 0 else (p_new > 1.0 - eps)
              wall = wall | ((coords3[ax] == edge) & beyond)
      if vbc_mark and not (ablate & 4):
          # Interior per-voxel BC surfaces: table row 18 carries a 0/1
          # 'cell has a custom face' mask (gathered for free by the same
          # one-hot matmul as the field rows); any marked-cell lane that
          # would exit its cell is frozen for the exact outlier replay,
          # which applies the per-face code (reflect/absorb/handler).
          beyond_any = jnp.zeros_like(safe)
          for ax in range(3):
              p_new = pos3[ax] + 2.0 * dp3[ax]
              beyond_any = beyond_any | (p_new < -1.0 + eps) \
                  | (p_new > 1.0 - eps)
          wall = wall | ((rows[18] > 0.5) & beyond_any)
      safe = safe & ~wall
      entry_flag = entry_flag | (live & wall)

      q0 = jnp.where(safe, qsp * w, 0.0)
      active = safe
      if not resident:
          adma_in.wait()

      px, py, pz = dx, dy, dz
      for round_idx in range(0 if ablate & 2 else max_streak):
          dirx = jnp.where(dpx > 0, 1.0, -1.0)
          diry = jnp.where(dpy > 0, 1.0, -1.0)
          dirz = jnp.where(dpz > 0, 1.0, -1.0)
          s0 = jnp.where(dpx == 0, BIG, (dirx - px) / jnp.where(dpx == 0, 1, dpx))
          s1 = jnp.where(dpy == 0, BIG, (diry - py) / jnp.where(dpy == 0, 1, dpy))
          s2 = jnp.where(dpz == 0, BIG, (dirz - pz) / jnp.where(dpz == 0, 1, dpz))
          v3w = jnp.full_like(s0, 2.0)
          axis = jnp.full_like(xi, 3)
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
          zero4 = (jnp.zeros_like(sdx),) * 4   # pad to 16 rows (tile align)
          vals = jnp.stack(jxs + jys + jzs + zero4, axis=0)  # (16, P)

          vox_cur = xi + g.NX * (yi + g.NY * 1)

          def deposit(vals=vals, vox_cur=vox_cur, active=active,
                      reuse=None):
              loc = vox_cur - w0
              if reuse is None:
                  okw = (loc >= 0) & (loc < V)
                  lo = jnp.where(okw, loc & 127, -1)[:, None]
                  oh_lo = (lane_r == lo).astype(jnp.bfloat16)
                  ohhi = (iota_h == (loc // 128)[None, :]).astype(jnp.float32)
              else:
                  # round 0: position == gather position, reuse its one-hots
                  oh_lo, ohhi = reuse
              # dep_terms-way bf16 split of vals BEFORE the h-expansion
              # (~2^-18 relative at 2 terms, ~2^-27 -- better than f32 --
              # at 3), so the (16H, P) expanded tensors are built directly
              # in bf16: the old expand-then-split shape paid ~5 f32
              # passes over 16H*P; this pays dep_terms bf16 writes (ohhi
              # is an exact 0/1 mask in either dtype).
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
                  upd = upd + dot(expand(v_mid), oh_lo)
                  r1 = r1 - v_mid.astype(jnp.float32)
              upd = upd + dot(expand(r1.astype(jnp.bfloat16)),
                              oh_lo)                      # (16H, 128)
              if resident:
                  acc_scratch[pl.ds(s16, 16 * H), :] += upd
              else:
                  acc_scratch[:, :] += upd
              oow_ref[0, 0] += jnp.sum(jnp.where(
                  active & ((vox_cur - w0 < 0) | (vox_cur - w0 >= V)), 1, 0))

          if ablate & 1:
              pass
          elif round_idx == 0:
              deposit(reuse=(oh_lo0, ohhi0))
          else:
              # common case: nobody crossed again -> skip the MXU work
              pl.when(jnp.any(active))(deposit)

          upd = lambda o, n: jnp.where(active, n, o)
          dpx = upd(dpx, dpx - sdx)
          dpy = upd(dpy, dpy - sdy)
          dpz = upd(dpz, dpz - sdz)
          px = upd(px, px + sdx + sdx)
          py = upd(py, py + sdy + sdy)
          pz = upd(pz, pz + sdz + sdz)

          ended = axis == 3
          crossing = active & ~ended
          active = crossing

          for ax, (pp, dd) in enumerate(((px, dirx), (py, diry), (pz, dirz))):
              m = crossing & (axis == ax)
              pn = jnp.where(m, dd, pp)
              if ax == 0:
                  px = pn
              elif ax == 1:
                  py = pn
              else:
                  pz = pn

          # Face handling (all in-kernel; no mid-walk freezes):
          #  x periodic: crossers walk into the ghost column; leaving the ghost
          #    layer re-maps to the canonical column (a +-nx linear jump --
          #    inside the window, GUARD covers it).
          #  y periodic (nz == 1): the walk continues UNWRAPPED -- yi beyond
          #    [0, NY) indexes the y-image column ranges that occupy the
          #    otherwise-unused z=0 / z=2 plane thirds of the table and
          #    accumulator (fold_ghost_acc_T folds them back).
          #  z (nz == 1) periodic: ghost cell IS the real cell, wrap in place.
          #  Reflecting faces bounce in place.
          BIG_LIM = 1 << 29
          for ax in range(3):
              m = crossing & (axis == ax)
              n_ax = (g.nx, g.ny, g.nz)[ax]
              coord = (xi, yi)[ax] if ax < 2 else jnp.ones_like(xi)
              d = (dirx, diry, dirz)[ax]
              newc = coord + jnp.where(d > 0, 1, -1)
              lo_bc = _eff_bc(g, ax, -1)
              hi_bc = _eff_bc(g, ax, 1)
              if ax == 1:
                  # unwrapped y: periodic sides have no limit at all
                  lo_lim = -BIG_LIM if lo_bc == P_PERIODIC else 1
                  hi_lim = BIG_LIM if hi_bc == P_PERIODIC else n_ax
              else:
                  lo_lim = 0 if lo_bc == P_PERIODIC else 1
                  hi_lim = n_ax + 1 if hi_bc == P_PERIODIC else n_ax
              out_lo = m & (newc < lo_lim)
              out_hi = m & (newc > hi_lim)
              inside = m & ~out_lo & ~out_hi
              coord = jnp.where(inside, newc, coord)
              flip = inside
              for side, om in ((-1, out_lo), (1, out_hi)):
                  bc = _eff_bc(g, ax, side)
                  if bc == P_PERIODIC:
                      # reachable only for ax == 0 (x ghost-layer exit):
                      # re-map to the canonical column and keep walking
                      coord = jnp.where(om, newc + (n_ax if side < 0
                                                    else -n_ax), coord)
                      flip = flip | om
                  elif bc == REFLECT_PARTICLES:
                      if ax == 0:
                          ux = jnp.where(om, -ux, ux)
                          dpx = jnp.where(om, -dpx, dpx)
                      elif ax == 1:
                          uy = jnp.where(om, -uy, uy)
                          dpy = jnp.where(om, -dpy, dpy)
                      else:
                          uz = jnp.where(om, -uz, uz)
                          dpz = jnp.where(om, -dpz, dpz)
                  else:
                      # wall face (absorb/custom): unreachable modulo the
                      # pre-flag's ULP margin -- park the lane at the face;
                      # the pre-flag catches it next step and the outlier
                      # pass applies the real BC then
                      if ax == 0:
                          dpx = jnp.where(om, 0.0, dpx)
                      elif ax == 1:
                          dpy = jnp.where(om, 0.0, dpy)
                      else:
                          dpz = jnp.where(om, 0.0, dpz)
              if ax == 0:
                  xi = coord
                  px = jnp.where(flip, -px, px)
              elif ax == 1:
                  yi = coord
                  py = jnp.where(flip, -py, py)
              else:
                  pz = jnp.where(flip, -pz, pz)

      if not resident:
          adma_out = pltpu.make_async_copy(acc_scratch,
                                           acc_ref.at[pl.ds(s16, 16 * H), :],
                                           acc_sem)
          adma_out.start()
          adma_out.wait()

      vox_new = jnp.where(safe, xi + g.NX * (yi + g.NY * 1), vox)
      opk_ref[0, :] = jnp.where(safe, px, dx)
      opk_ref[1, :] = jnp.where(safe, py, dy)
      opk_ref[2, :] = jnp.where(safe, pz, dz)
      opk_ref[3, :] = vox_new.astype(jnp.float32)
      opk_ref[4, :] = jnp.where(safe, ux, pk_ref[4, :])
      opk_ref[5, :] = jnp.where(safe, uy, pk_ref[5, :])
      opk_ref[6, :] = jnp.where(safe, uz, pk_ref[6, :])
      opk_ref[7, :] = jnp.where(entry_flag, 1.0, 0.0)

    if resident:
        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            adma_out = pltpu.make_async_copy(acc_scratch, acc_ref, acc_sem)
            adma_out.start()
            adma_out.wait()


def vmem_plan(nvp: int, window: int) -> Tuple[int, bool, int]:
    """(block, resident, window) keeping the kernel inside the ~16 MB VMEM
    budget: resident tables + the (P, V) one-hot/vals transients + double-
    buffered particle blocks.  Larger blocks amortize per-block overhead
    (2048 measured +5% over 1024 where it fits); resident tables beat
    streamed windows; blocks below 1024 are invalid (the XLA 1-D f32
    tile).  Try the combinations best-first; when nothing fits at the
    requested window, SHRINK the window (more outlier flags, but the
    kernel stays compilable) rather than returning an over-budget plan."""
    win = window
    while win >= 256:
        H = win // 128
        for block in (4096, 2048, 1024):
            for resident in (True, False):
                tabs = (24 + 16) * (nvp if resident else win) * 4
                # factorized-one-hot transients: G2 (24H,P) f32, rhsT
                # (16H,P) f32 + bf16 splits, lo one-hots, particle blocks
                trans = block * (264 * H + 648)
                if resident and tabs > RESIDENT_VMEM_BUDGET:
                    continue
                if tabs + trans <= (14 << 20):
                    return block, resident, win
        win = _round_up(win // 2, 128)
        if win >= window:
            break
    return 1024, False, 256


@functools.partial(jax.jit, static_argnames=("g", "qsps", "msps",
                                             "max_streak", "block", "window",
                                             "ablate", "vbc_mark",
                                             "dep_terms"))
def _run(sps, fcoef_T, acc_T, g: Grid, qsps, msps,
         max_streak=4, block=0, window=DEF_WINDOW, ablate=0,
         vbc_mark=False, dep_terms=2):
    """All species through ONE kernel launch: each species is padded to a
    block multiple and the segments concatenated, so every block is
    species-pure and carries its own (qdt_2mc, q) via scalar prefetch.
    Sharing one launch amortizes the call-fixed costs (table residency
    DMA, prep/post relayouts, Mosaic dispatch) across species -- the
    per-species launch was ~half fixed cost at 64^2x64ppc."""
    sps = tuple(sps)
    nvp = fcoef_T.shape[1]
    window = min(window, nvp)
    auto_block, resident, window = vmem_plan(nvp, window)
    block = block or auto_block

    cols = {k: [] for k in ("dx", "dy", "dz", "vox", "ux", "uy", "uz",
                            "w", "live")}
    w0s, nls, qd2s, qws, Nps = [], [], [], [], []
    for sp, qsp, msp in zip(sps, qsps, msps):
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

        # Window starts: anchored at the block's LIVE-minimum voxel minus
        # the guard, floored to 128 (always aligned by construction).
        # Re-derived per STEP, so the window tracks the block's current
        # span rather than budgeting worst-case drift from the sort --
        # that's what lets pick_window shrink to the measured span
        # (max 760 lanes at 64^2 sortK 8) instead of 2*(K-1)*NX.  The
        # guard'd minimum lane lands >= GUARD inside the window (floor
        # only moves w0 DOWN), and the far tail either fits or is
        # entry-flagged for the exact outlier replay.
        vb = vox.reshape(nb, block)
        lvb = live.reshape(nb, block)
        nlive = jnp.sum(lvb, axis=1)
        mn = jnp.min(jnp.where(lvb > 0, vb, jnp.int32(1 << 30)), axis=1)
        GU = guard(g)
        w0s.append(jnp.where(
            nlive > 0,
            jnp.clip(((mn - GU) // 128) * 128, 0, nvp - window), 0))
        nls.append(nlive)
        qd2s.append(jnp.full((nb,), (qsp * g.dt) / (2.0 * msp * g.cvac),
                             jnp.float32))
        qws.append(jnp.full((nb,), qsp, jnp.float32))

    cat = lambda xs: xs[0] if len(xs) == 1 else jnp.concatenate(xs)
    order = ("dx", "dy", "dz", "vox", "ux", "uy", "uz", "w", "live")
    pk = jnp.stack([cat(cols[k]) for k in order])       # (9, Ntot) f32
    w0, nlive = cat(w0s), cat(nls)
    qd2, qw = cat(qd2s), cat(qws)
    Ntot = sum(Nps)
    nblocks = Ntot // block

    # h-major row layouts for the factorized kernel: tabF[hg*24+r, l] and
    # accF[hg*16+r, l] with v = hg*128 + l (one XLA transpose each way;
    # windows become multiple-of-8 sublane slices inside the kernel)
    nvh = nvp // 128
    H = window // 128
    tabF = fcoef_T.reshape(24, nvh, 128).transpose(1, 0, 2).reshape(
        nvh * 24, 128)
    accF = acc_T.reshape(16, nvh, 128).transpose(1, 0, 2).reshape(
        nvh * 16, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((9, block), lambda b, *_: (0, b))]
        + [pl.BlockSpec(memory_space=pl.ANY),
           pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((8, block), lambda b, *_: (0, b))]
        + [pl.BlockSpec(memory_space=pl.ANY),
           pl.BlockSpec((1, 1), lambda b, *_: (0, 0),
                        memory_space=pltpu.SMEM)],
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA,
                        pltpu.VMEM((nvh * 24 if resident else 24 * H, 128),
                                   jnp.float32),
                        pltpu.VMEM((nvh * 16 if resident else 16 * H, 128),
                                   jnp.float32)],
    )

    kernel = functools.partial(_kernel, g, max_streak, block,
                               window, nvp, resident, ablate, vbc_mark,
                               dep_terms)
    out_shapes = [jax.ShapeDtypeStruct((8, Ntot), jnp.float32),
                  jax.ShapeDtypeStruct((nvh * 16, 128), jnp.float32),
                  jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    if ablate & 32:   # measure _run's XLA prep alone (dev: scripts/ablate_push)
        return ([sp.replace(dx=sp.dx + w0[0] * 0.0 + pk[0, 0] * 0.0)
                 for sp in sps], acc_T,
                [jnp.zeros((sp.capacity,), jnp.int32) for sp in sps],
                jnp.int32(0))
    interpret = jax.devices()[0].platform != "tpu"
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        input_output_aliases={6: 1},     # acc carry-in aliases acc out
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(w0, nlive, qd2, qw, pk, tabF, accF)

    (opk, accF_out, oow) = outs
    acc_out = accF_out.reshape(nvh, 16, 128).transpose(1, 0, 2).reshape(
        16, nvp)
    ovox_all = opk[3].astype(jnp.int32)
    new_sps, oflags, off = [], [], 0
    for sp, Np in zip(sps, Nps):
        N = sp.capacity
        sl = slice(off, off + N)
        new_sps.append(sp.replace(
            dx=opk[0, sl], dy=opk[1, sl], dz=opk[2, sl],
            i=jnp.where(sp.live, ovox_all[sl], sp.i),
            ux=opk[4, sl], uy=opk[5, sl], uz=opk[6, sl]))
        oflags.append((opk[7, sl] > 0.5).astype(jnp.int32))
        off += Np
    return new_sps, acc_out, oflags, oow[0, 0]


def _y_unwrapped(g: Grid) -> bool:
    """Does the fused path run the unwrapped-y scheme (periodic y images in
    the z=0/z=2 plane thirds)?  Only meaningful when supports(g)."""
    return g.nz == 1 and _eff_bc(g, 1, -1) == P_PERIODIC


def remap_ghost_voxels(sp: SpeciesState, g: Grid) -> SpeciesState:
    """Map fused-path voxel indices back to canonical interior cells: wraps
    periodic ghost residents, and (nz==1, periodic y) decodes unwrapped-y
    image residents from the z=0 / z=2 plane thirds."""
    from .push import divmod_const, mod_wrap1
    zi, r = divmod_const(sp.i, g.sz, g.nv)
    yi, xi = divmod_const(r, g.sy, g.sz)
    if _y_unwrapped(g):
        yu = yi + (zi - 1) * g.NY       # unwrapped y in [-NY, 2*NY)
        yi = mod_wrap1(yu, g.ny, 2 * g.NY + 1)
        zi = jnp.ones_like(zi)
    coords = [xi, yi, zi]
    for ax, n_ax in enumerate((g.nx, g.ny, g.nz)):
        if _eff_bc(g, ax, -1) != P_PERIODIC:
            continue
        if ax == 1 and _y_unwrapped(g):
            continue                    # already canonical via the mod
        c = coords[ax]
        c = jnp.where(c == 0, n_ax, c)
        coords[ax] = jnp.where(c == n_ax + 1, 1, c)
    vox = coords[0] + g.NX * (coords[1] + g.NY * coords[2])
    return sp.replace(i=jnp.where(sp.live, vox, sp.i))


def fold_ghost_acc_T(acc_T, g: Grid):
    """Fold periodic ghost-plane deposits onto their real partner planes
    (the transposed-layout analogue of the accumulator ghost convention).
    Under the unwrapped-y scheme, first fold the y-image plane thirds
    (deposits from walks that continued past the y ghost layer) onto their
    canonical plane-1 rows."""
    import numpy as np
    rows = acc_T.shape[0]
    a = acc_T[:12, :g.nv].reshape(12, g.NZ, g.NY, g.NX)
    if _y_unwrapped(g) and g.ny >= 4:
        # Image-plane folds are roll-by-constant maps (plane-0 row r ->
        # canonical row (r-3)%ny+1, plane-2 -> (r+1)%ny+1), so each is TWO
        # static slice-adds.  The previous .at[...].add scatter with the
        # constant index vector cost ~0.28 ms/step at 64^2 (scatters are
        # latency-bound on this chip); slices are ~free.
        ny, NY = g.ny, g.NY
        p1 = a[:, 1]
        a0, a2 = a[:, 0], a[:, 2]
        p1 = p1.at[:, 1:ny, :].add(a0[:, 3:NY, :])          # m0 segment A
        p1 = p1.at[:, ny - 2:ny + 1, :].add(a0[:, 0:3, :])  # m0 segment B
        p1 = p1.at[:, 2:ny + 1, :].add(a2[:, 0:ny - 1, :])  # m2 segment A
        p1 = p1.at[:, 1:4, :].add(a2[:, ny - 1:NY, :])      # m2 segment B
        z = jnp.zeros_like(p1)
        a = jnp.stack([z, p1, z], axis=1)
    elif _y_unwrapped(g):
        r = np.arange(g.NY)
        m0 = (r - 3) % g.ny + 1         # plane-0 row r holds y_u = r - NY
        m2 = (r + 1) % g.ny + 1         # plane-2 row r holds y_u = r + NY
        p1 = a[:, 1]
        p1 = p1.at[:, m0, :].add(a[:, 0])
        p1 = p1.at[:, m2, :].add(a[:, 2])
        z = jnp.zeros_like(p1)
        a = jnp.stack([z, p1, z], axis=1)
    for ax, n_ax in enumerate((g.nx, g.ny, g.nz)):
        if _eff_bc(g, ax, -1) != P_PERIODIC:
            continue
        aa = 3 - ax  # array axis within (12, NZ, NY, NX)
        lo = jax.lax.index_in_dim(a, 0, aa, keepdims=True)
        hi = jax.lax.index_in_dim(a, n_ax + 1, aa, keepdims=True)

        def sl(i):
            s = [slice(None)] * 4
            s[aa] = slice(i, i + 1)
            return tuple(s)

        from .fields import slset
        a = slset(a, sl(n_ax), a[sl(n_ax)] + lo)
        a = slset(a, sl(1), a[sl(1)] + hi)
        a = slset(a, sl(0), jnp.zeros_like(lo))
        a = slset(a, sl(n_ax + 1), jnp.zeros_like(hi))
    nvp = acc_T.shape[1]
    return jnp.pad(a.reshape(12, g.nv),
                   ((0, rows - 12), (0, nvp - g.nv)))


def _compact(sp: SpeciesState, flags, extra, cap):
    """Gather flagged lanes into a fixed-size buffer; returns (small_species,
    small_extra_arrays, idx, valid)."""
    count = jnp.sum(flags.astype(jnp.int32))
    idx = jnp.nonzero(flags, size=cap, fill_value=0)[0]
    valid = (jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0] < count)
    takef = lambda a: jnp.where(valid, a[idx], 0.0)
    small = SpeciesState(
        dx=takef(sp.dx), dy=takef(sp.dy), dz=takef(sp.dz),
        i=jnp.where(valid, sp.i[idx], 0),
        ux=takef(sp.ux), uy=takef(sp.uy), uz=takef(sp.uz),
        w=takef(sp.w), live=valid & sp.live[idx], np=count)
    return small, tuple(takef(a) for a in extra), idx, valid


def _scatter_back(sp: SpeciesState, s2: SpeciesState, idx, valid):
    # ONE packed row scatter instead of 9 separate scatters (TPU scatters
    # are latency-bound; rows are contiguous) -- same trick as bucket_sort.
    tgt = jnp.where(valid, idx, sp.capacity)           # OOB -> dropped
    fields = ("dx", "dy", "dz", "ux", "uy", "uz", "w")
    big = jnp.stack([getattr(sp, n) for n in fields]
                    + [jax.lax.bitcast_convert_type(sp.i, jnp.float32),
                       sp.live.astype(jnp.float32)], axis=1)
    small = jnp.stack([getattr(s2, n) for n in fields]
                      + [jax.lax.bitcast_convert_type(s2.i, jnp.float32),
                         s2.live.astype(jnp.float32)], axis=1)
    big = big.at[tgt].set(small, mode="drop")
    live = big[:, 8] > 0.5
    return sp.replace(
        dx=big[:, 0], dy=big[:, 1], dz=big[:, 2],
        ux=big[:, 3], uy=big[:, 4], uz=big[:, 5], w=big[:, 6],
        i=jax.lax.bitcast_convert_type(big[:, 7], jnp.int32),
        live=live, np=jnp.sum(live.astype(jnp.int32)))


def outlier_pass(sp: SpeciesState, oflag, fcoef_T, g: Grid,
                 qsp: float, msp: float, acc_small, rhob_flat,
                 max_streak: int = 4, cap: int = 0, spp=None,
                 custom_handlers=None, key=None, return_pends: bool = False,
                 remap_fn=None, encode_fn=None, diag=None, vbc=None,
                 gate: bool = True):
    """Redo entry-guard-flagged lanes through the general XLA advance_p on
    a compacted fixed-size buffer, under a lax.cond so the common
    no-outlier step pays (nearly) nothing.  Two lane classes land here,
    both frozen untouched by the kernel: stale-sort drift (out of window)
    and wall pre-flags (would cross an absorbing/custom face).  advance_p
    replays them exactly -- including absorb-with-rhob -- and any custom
    particle-BC pends are dispatched to ``custom_handlers`` (requires
    ``spp``/``key``) like the general path's boundary_p.  acc_small is a
    separate (nv, 12) accumulator merged at unload.  ``diag`` (if given) is
    the jit-carried diagnostics dict threaded through handler dispatch and
    returned as the extra last element."""
    from .push import DONE, advance_p
    N = sp.capacity
    cap = cap or max(1024, N // 128)
    pend0 = jnp.full((N,), DONE, jnp.int32)
    zeros = jnp.zeros((N,), jnp.float32)
    diag_c = {} if diag is None else diag

    remap = remap_fn or (lambda s: remap_ghost_voxels(s, g))

    def body(carry):
        sp, acc_small, rhob_flat, dg, flags, pend, disp, it = carry
        small, _, idx, valid = _compact(sp, flags, (), cap)
        small = remap(small)
        rows = fcoef_T[:, small.i].T                   # (cap, 18)
        res = advance_p(small, None, g, qsp, msp, acc_small, rhob_flat,
                        max_streak=max_streak, rows=rows, unroll=True,
                        vbc=vbc)
        s2, acc2, rhob2 = res.species, res.acc, res.rhob_flat
        tgt = jnp.where(valid, idx, N)
        if return_pends:
            # hand unfinished lanes (remote faces / custom BCs) to the
            # deck-level boundary_p on full-size arrays
            pend = pend.at[tgt].set(
                jnp.where(valid, res.pend_face, DONE), mode="drop")
            disp = tuple(z.at[tgt].set(jnp.where(valid, d, 0.0),
                                       mode="drop")
                         for z, d in zip(disp, res.pend_disp))
        elif custom_handlers:
            from .. import boundary as B
            [s2], acc2, rhob2, _, dg = B.boundary_p(
                [s2], [spp], [res.pend_face], [res.pend_disp], acc2,
                rhob2, g, num_comm_round=0, max_streak=max_streak,
                custom_handlers=custom_handlers,
                key=jax.random.fold_in(key, it), diag=dg)
        if encode_fn is not None:
            s2 = encode_fn(s2)   # canonical -> chart index for storage
        sp = _scatter_back(sp, s2, idx, valid)
        flags = flags.at[tgt].set(False, mode="drop")
        return sp, acc2, rhob2, dg, flags, pend, disp, it + 1

    # batch-process until no flags remain (a step with more outliers than
    # cap just takes extra rounds instead of silently stalling lanes);
    # the outer cond keeps the common no-outlier step from even building
    # the while carry.  ``gate=False`` skips that cond for callers that
    # provide their own joint gate over several species (each lax.cond
    # costs ~28 us on this chip; the ungated while exits immediately on
    # an empty flag set).
    init = (sp, acc_small, rhob_flat, diag_c, oflag == 1, pend0,
            (zeros, zeros, zeros), jnp.int32(0))
    run = lambda a: jax.lax.while_loop(lambda c: jnp.any(c[4]), body, a)
    if gate:
        out = jax.lax.cond(jnp.any(oflag == 1), run, lambda a: a, init)
    else:
        out = run(init)
    sp, acc_small, rhob_flat, diag_c, _, pend, disp, _ = out
    if return_pends:
        return sp, acc_small, rhob_flat, pend, disp
    if diag is not None:
        return sp, acc_small, rhob_flat, diag_c
    return sp, acc_small, rhob_flat


def fused_push(sp: SpeciesState, fcoef_T, acc_T, g: Grid, qsp: float,
               msp: float, max_streak: int = 4, block: int = 0,
               window: int = DEF_WINDOW, ablate: int = 0,
               vbc_mark: bool = False, dep_terms: int = 2):
    """One species push through the fused kernel (transposed layouts).

    Precondition: particles bucket-sorted recently enough that each block's
    voxels fit the window (flagged outliers go to outlier_pass).  Particles
    may reside in periodic ghost cells / unwrapped y-image cells between
    sorts (the interpolator table carries ghost + image columns and
    fold_ghost_acc_T folds their deposits); callers remap_ghost_voxels
    before sorting / external consumption.
    Returns (species, acc_T, outlier_flags, oow)."""
    sps, acc_T, oflags, oow = _run(
        (sp,), fcoef_T, acc_T, g, (float(qsp),), (float(msp),),
        max_streak, block, window, ablate, vbc_mark, dep_terms)
    return sps[0], acc_T, oflags[0], oow


def fused_push_multi(sps, fcoef_T, acc_T, g: Grid, qms,
                     max_streak: int = 4, block: int = 0,
                     window: int = DEF_WINDOW, ablate: int = 0,
                     vbc_mark: bool = False, dep_terms: int = 2):
    """All species through ONE fused kernel launch (see _run).  ``qms`` is
    a sequence of (charge, mass) per species.  Returns
    (list_of_species, acc_T, list_of_outlier_flags, oow)."""
    return _run(tuple(sps), fcoef_T, acc_T, g,
                tuple(float(q) for q, _ in qms),
                tuple(float(m) for _, m in qms),
                max_streak, block, window, ablate, vbc_mark, dep_terms)


def expand_y_images_T(tab_T, g: Grid):
    """Fill the z=0 / z=2 plane thirds of a transposed (rows, nvp) table
    with periodic y-image copies of the z=1 plane (nz == 1 only)."""
    import numpy as np
    rows = tab_T.shape[0]
    z1 = tab_T[:, g.sz:2 * g.sz].reshape(rows, g.NY, g.NX)
    if g.ny >= 4:
        # constant roll-by-k row maps -> TWO static concats per plane
        # (constant-index row gathers pay the per-row gather floor)
        ny = g.ny
        p0 = jnp.concatenate([z1[:, ny - 2:ny + 1], z1[:, 1:ny]], axis=1)
        p2 = jnp.concatenate([z1[:, 2:ny + 1], z1[:, 1:4]], axis=1)
    else:
        m0 = (np.arange(g.NY) - 3) % g.ny + 1
        m2 = (np.arange(g.NY) + 1) % g.ny + 1
        p0, p2 = z1[:, m0], z1[:, m2]
    return (tab_T.at[:, :g.sz].set(p0.reshape(rows, -1))
            .at[:, 2 * g.sz:3 * g.sz].set(p2.reshape(rows, -1)))


def advance_p_fused(sp: SpeciesState, fcoef, g: Grid, qsp: float, msp: float,
                    acc, rhob_flat, max_streak: int = 4,
                    block: int = 0,
                    window: int = 0) -> PushResult:
    """Drop-in replacement for ops.push.advance_p (layout conversions at the
    boundary; used by tests -- the deck fast path drives fused_push with
    persistent transposed layouts instead)."""
    window = window or pick_window(g)
    nvp = table_width(g, window)
    fcoef_T = jnp.zeros((24, nvp), jnp.float32).at[:18, :g.nv].set(fcoef.T)
    if _y_unwrapped(g):
        fcoef_T = expand_y_images_T(fcoef_T, g)
    acc_T = jnp.zeros((16, nvp), jnp.float32).at[:12, :g.nv].set(acc.T)
    sp = bucket_sort_p(sp, g)
    new_sp, acc_T, oflag, oow = fused_push(sp, fcoef_T, acc_T, g, qsp,
                                           msp, max_streak, block, window)
    acc_small = jnp.zeros((g.nv, 12), jnp.float32)
    new_sp, acc_small, rhob_flat = outlier_pass(
        new_sp, oflag, fcoef_T, g, qsp, msp, acc_small, rhob_flat,
        max_streak)
    new_sp = remap_ghost_voxels(new_sp, g)
    acc_T = fold_ghost_acc_T(acc_T, g)
    acc_T = acc_T.at[:12, :g.nv].add(acc_small.T)
    acc_new = acc_T[:12, :g.nv].T
    pend = jnp.full((sp.capacity,), -1, jnp.int32)
    zeros = jnp.zeros((sp.capacity,), jnp.float32)
    return PushResult(new_sp, acc_new, rhob_flat, pend,
                      (zeros, zeros, zeros), oow)
