#!/usr/bin/env python
"""Row-gather / segmented-sort primitive costs on the real TPU (dev tool).

Informs the 3-D sort redesign: per-row gather floors at various pack
widths, element gathers, and row-wise (segmented) sorts, each timed as a
single jitted lax.scan dispatch with data-dependent feedback.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(fn, init, n, label):
    f = jax.jit(lambda c: jax.lax.scan(lambda c, _: (fn(c), None), c, None,
                                       length=n)[0])
    out = f(init)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = f(init)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:52s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 21)
    n = 30
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(N), jnp.int32)

    # pack-width row gathers (same total payload, fewer/wider rows)
    for pack in (1, 2, 4):
        R = N // pack
        mat = jnp.asarray(rng.random((R, 8 * pack), np.float32))
        src = jnp.asarray(rng.permutation(R), jnp.int32)

        def fn(c, mat=mat, R=R):
            s, acc = c
            out = jnp.take(mat, s, axis=0)
            # feedback: derive next src from output (prevents dedup)
            s2 = (s + out[:, 0].astype(jnp.int32) % 3 + 1) % R
            return (s2, acc + out[0, 0])

        scan_time(fn, (src, jnp.float32(0)), n,
                  f"row gather ({R}, {8 * pack}) f32")

    # element gather (N,) int32 (the q_src composition candidate)
    vals = jnp.asarray(rng.integers(0, N, N), jnp.int32)

    def fn_elem(c):
        s, acc = c
        out = jnp.take(vals, s)
        return ((s + out % 2 + 1) % N, acc + out[0])

    scan_time(fn_elem, (perm, jnp.int32(0)), n, "element gather (N,) i32")

    # vmapped dynamic-slice runs (the current _sort_src_q materializer)
    nblk = N // 1024
    starts = jnp.asarray(rng.integers(0, N - 1024, nblk), jnp.int32)

    def fn_runs(c):
        s, acc = c
        runs = jax.vmap(
            lambda st: jax.lax.dynamic_slice(vals, (st,), (1024,)))(s)
        return ((s + runs[:, 0] % 2 + 1) % (N - 1024), acc + runs[0, 0])

    scan_time(fn_runs, (starts, jnp.int32(0)), n,
              f"vmapped dyn-slice runs ({nblk} x 1024) i32")

    # row-wise multi-operand sort: (nblk, 1024) with 8 f32 value cols
    keys = jnp.asarray(rng.integers(0, 1 << 20, (nblk, 1024)), jnp.int32)
    cols = [jnp.asarray(rng.random((nblk, 1024), np.float32))
            for _ in range(8)]

    def fn_rowsort(c):
        k = c[0]
        out = jax.lax.sort((k,) + tuple(c[1:]), dimension=1, num_keys=1,
                           is_stable=True)
        k2 = out[0] + out[1].astype(jnp.int32) % 2
        return (k2,) + out[1:]

    scan_time(fn_rowsort, (keys,) + tuple(cols), n,
              f"row-wise sort ({nblk}, 1024) 1key+8vals")

    def fn_rowsort_k(c):
        k, acc = c
        out = jax.lax.sort(k, dimension=1)
        return (out + acc % 2, acc + out[0, 0])

    scan_time(fn_rowsort_k, (keys, jnp.int32(0)), n,
              f"row-wise sort ({nblk}, 1024) key only")

    # full-length single-operand sort (packed_src_sort's core)
    def fn_fullsort(c):
        k, acc = c
        out = jax.lax.sort(k)
        return ((out + acc % 2) % (1 << 22), acc + out[0])

    scan_time(fn_fullsort, (vals, jnp.int32(0)), n,
              "full sort (N,) u32-equivalent")


if __name__ == "__main__":
    main()
