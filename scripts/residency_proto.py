#!/usr/bin/env python
"""Microbenchmarks for the round-5 bucketed-residency design (ROUND4.md
item 2): can the per-step global sort + 6.4 ns/row gather be replaced by
in-kernel compaction + neighbor-mailbox DMAs?

Two primitives are validated and timed on the live chip:

1. SEGMENTED ONE-HOT COMPACTION: remove flagged lanes from a (9, P) block
   IN VMEM.  Output lane i of segment s sources from a [S*s, S*s + 2S)
   window (compaction displacement <= S removals per segment window by
   construction when the removal cap is S); each segment is one
   (2S-band one-hot) x (payload) MXU dot.  Estimated ~2-3 us/block.

2. MAILBOX WRITES: each grid block DMA-copies a small (9, M) outbox from
   VMEM scratch to HBM at a DYNAMIC row offset (scalar-prefetched) -- the
   per-direction neighbor mailbox write.  Estimated ~0.5-1 us/DMA.

Usage: residency_proto.py [--cpu]
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 4096          # lanes per block
S = 512           # segment size == per-segment removal cap


def _compact_kernel(pk_ref, keep_ref, opk_ref, cnt_ref):
    """Compact kept lanes of a (9, P) block to the front (stable), zeros
    after.  keep is 0.0/1.0.  positions: pos[i] = #kept before i; output
    lane j takes input lane i iff keep[i] and pos[i] == j.  Segment s of
    the output (lanes [S*s, S*s+S)) can only source from input lanes
    [S*s, S*s+2S) when each S-window removes <= S lanes -- guaranteed by
    capping removals per segment window (overflow lanes stay put and are
    entry-flagged, like every other cap in the fused path)."""
    pk = pk_ref[:, :]                       # (9, P)
    keep = keep_ref[0, :]                   # (P,)
    kf = keep
    # Mosaic has no cumsum: exact prefix sum via triangular matmuls
    # (integer-valued f32 at HIGHEST precision; rows of 128, then row
    # offsets through a second small triangular dot)
    R = P // 128
    X = kf.reshape(R, 128)
    i_id = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j_id = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = (i_id <= j_id).astype(jnp.float32)            # inclusive
    hdot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    row_c = hdot(X, tri)                                # (R, 128)
    row_tot = row_c[:, 127]                             # (R,)
    ir = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    triR = (ir < jr).astype(jnp.float32)                # strict lower
    off = hdot(row_tot[None, :], triR)[0]               # (R,)
    pos = (row_c + off[:, None]).reshape(P) - kf        # exclusive
    pos = jnp.where(keep > 0.5, pos, -1.0)
    cnt_ref[0, 0] = jnp.sum(kf).astype(jnp.int32)
    # EXACT move: f32 dot at HIGHEST precision against an exact 0/1
    # one-hot -- every output element is a single x*1.0 product plus
    # zeros, so the permutation is bit-exact (bf16 payload passes measured
    # 2.8e-3 relative: unusable for particle state)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    for s in range(P // S):
        lo = max(0, S * s)
        w = min(2 * S, P - lo)
        seg_pos = pos[lo:lo + w]            # source-lane global positions
        # one-hot: oh[i_src, j_out_local] = (pos[src] == S*s + j)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (w, S), 1) + S * s
        oh = (seg_pos[:, None] == j_iota.astype(jnp.float32)).astype(
            jnp.float32)                    # (w, S)
        seg = dot(pk[:, lo:lo + w], oh)     # (9, S)
        opk_ref[:, S * s:S * (s + 1)] = seg   # ref store: static slice


def compact_block(pk, keep):
    return pl.pallas_call(
        _compact_kernel,
        out_shape=[jax.ShapeDtypeStruct((9, P), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        interpret=jax.devices()[0].platform != "tpu",
    )(pk, keep)


M = 128           # mailbox width (lane tile)


def _mailbox_kernel(off_ref, pk_ref, out_ref, sem):
    """Each block writes its (16, M) outbox slice to HBM at a dynamic
    lane offset (the neighbor-mailbox write pattern; 16 sublanes x 128
    lanes keeps the DMA slice tile-aligned)."""
    b = pl.program_id(0)
    off = pl.multiple_of(off_ref[b], M)     # offsets are M-aligned slots
    src = pk_ref.at[:, pl.ds(M * b, M)]
    dst = out_ref.at[:, pl.ds(off, M)]
    cp = pltpu.make_async_copy(src, dst, sem)
    cp.start()
    cp.wait()


def mailbox(pk, offs, nblocks, n_out):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _mailbox_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, n_out), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu",
        compiler_params=None if jax.devices()[0].platform != "tpu"
        else pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(offs, pk)


def main():
    rng = np.random.default_rng(0)
    pk = jnp.asarray(rng.normal(size=(9, P)).astype(np.float32))
    # ~12% removals, capped under S per 2S window by construction here
    keep_np = (rng.random(P) > 0.12).astype(np.float32)
    keep = jnp.asarray(keep_np[None, :])

    out, cnt = jax.jit(compact_block)(pk, keep)
    # reference compaction
    idx = np.nonzero(keep_np > 0.5)[0]
    ref = np.zeros((9, P), np.float32)
    ref[:, :len(idx)] = np.asarray(pk)[:, idx]
    got = np.asarray(out)
    err = np.abs(got[:, :len(idx)] - ref[:, :len(idx)]).max()
    print(f"compaction parity: n={int(cnt[0,0])}/{len(idx)} "
          f"max abs err {err:.2e} (must be exact)")
    assert int(cnt[0, 0]) == len(idx)
    assert err == 0.0, "compaction must be bit-exact"

    nblocks = 96
    big = jnp.asarray(rng.normal(size=(16, M * nblocks)).astype(np.float32))
    offs = jnp.asarray((rng.permutation(nblocks) * M).astype(np.int32))
    outm = jax.jit(lambda p, o: mailbox(p, o, nblocks, M * nblocks))(
        big, offs)
    # verify the permuted copy
    om = np.asarray(outm)
    for b in range(nblocks):
        o = int(offs[b])
        np.testing.assert_array_equal(om[:, o:o + M],
                                      np.asarray(big)[:, M * b:M * b + M])
    print("mailbox parity: ok")

    if CPU:
        print("cpu interpret OK")
        return

    def scan_time(fn, init, n, label, per=1):
        run = jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: (fn(cc), None), c, None, length=n)[0])
        o = run(init)
        jax.block_until_ready(jax.tree.leaves(o)[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(o)
            jax.block_until_ready(jax.tree.leaves(o)[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{label:34s} {best*1e6/n/per:8.2f} us/unit", flush=True)

    scan_time(lambda c: compact_block(c, keep)[0], pk, 200,
              "compaction (per 4096-lane block)")
    scan_time(lambda c: mailbox(c, offs, nblocks, M * nblocks), big, 100,
              "mailbox DMA (per block write)", per=nblocks)


if __name__ == "__main__":
    main()
