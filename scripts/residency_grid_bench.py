"""In-grid compaction marginal cost: grid=(nblocks,) kernel, each block
reads (16, P) from HBM, optionally compacts in VMEM, writes back --
the structure the residency megakernel would use."""
import sys, time, functools
sys.path.insert(0, __file__.rsplit('/', 2)[0])
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, S = 4096, 512
NB = 64

def make(compact):
    def kern(pk_ref, keep_ref, opk_ref):
        pk = pk_ref[:, :]                   # (16, P) block
        if not compact:
            opk_ref[:, :] = pk
            return
        kf = keep_ref[0, :]
        R = P // 128
        X = kf.reshape(R, 128)
        i_id = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        j_id = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        tri = (i_id <= j_id).astype(jnp.float32)
        hdot = functools.partial(jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        row_c = hdot(X, tri)
        row_tot = row_c[:, 127]
        ir = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        jr = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
        triR = (ir < jr).astype(jnp.float32)
        off = hdot(row_tot[None, :], triR)[0]
        pos = (row_c + off[:, None]).reshape(P) - kf
        pos = jnp.where(kf > 0.5, pos, -1.0)
        for s in range(P // S):
            lo = S * s
            w = min(2 * S, P - lo)
            seg_pos = pos[lo:lo + w]
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (w, S), 1) + S * s
            oh = (seg_pos[:, None] == j_iota.astype(jnp.float32))
            seg = hdot(pk[:, lo:lo+w], oh.astype(jnp.float32))
            opk_ref[:, S*s:S*(s+1)] = seg
    def run(pk, keep):
        return pl.pallas_call(kern,
            grid=(NB,),
            out_shape=jax.ShapeDtypeStruct((16, NB*P), jnp.float32),
            in_specs=[pl.BlockSpec((16, P), lambda b: (0, b)),
                      pl.BlockSpec((1, P), lambda b: (0, b))],
            out_specs=pl.BlockSpec((16, P), lambda b: (0, b)),
            interpret=jax.devices()[0].platform != "tpu",
            compiler_params=None if jax.devices()[0].platform != "tpu"
            else pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
            )(pk, keep)
    return run

rng = np.random.default_rng(0)
pk = jnp.asarray(rng.normal(size=(16, NB*P)).astype(np.float32))
keep = jnp.asarray((rng.random((1, NB*P)) > 0.12).astype(np.float32))

# correctness on one block
out = jax.jit(make(True))(pk, keep)
k0 = np.asarray(keep[0, :P]) > 0.5
idx = np.nonzero(k0)[0]
ref = np.asarray(pk)[:, :P][:, idx]
got = np.asarray(out)[:, :len(idx)]
assert np.abs(got - ref).max() == 0.0, "grid compaction mismatch"
print("grid compaction parity ok")

for compact in (False, True):
    run = make(compact)
    f = jax.jit(lambda c: jax.lax.scan(lambda cc,_ : (run(cc, keep), None),
                                       c, None, length=50)[0])
    o = f(pk); jax.block_until_ready(o)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); o = f(o); jax.block_until_ready(o)
        best = min(best, time.perf_counter()-t0)
    label = "compact" if compact else "copy"
    print(f"{label:8s} {best*1e6/50:9.1f} us/iter  "
          f"{best*1e6/50/NB:7.2f} us/block", flush=True)
