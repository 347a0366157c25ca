"""Price time-step unrolling for the fused GRU kernel.

Standalone copies of the production forward kernel (nn/pallas_gru.py) with
U consecutive time rows per grid step, at the training shape
(T=400 recurrent steps, B=100, S=96).  If amortising the per-step grid/DMA
machinery wins meaningfully here, it's worth wiring into production.

    python scripts/bench_gru_unroll.py [U ...]
"""
import sys
import time
from functools import partial

import numpy as np


def run_case(U, B=100, S=96, T=400, precision="highest"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nblk = -(-T // U)
    Tp = nblk * U

    def kernel(xp_ref, sWT_ref, sW2T_ref, out_ref, h):
        @pl.when(pl.program_id(0) == 0)
        def _init():
            h[:] = jnp.zeros((B, S), jnp.float32)

        for j in range(U):
            lp = xp_ref[j]
            vS = jnp.dot(h[:], sWT_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=precision)
            vT = lp[:, :2 * S] + vS
            z = jax.nn.sigmoid(vT[:, :S])
            r = jax.nn.sigmoid(vT[:, S:])
            y = jnp.dot(r * h[:], sW2T_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=precision)
            hbar = jnp.tanh(lp[:, 2 * S:] + y)
            new = z * h[:] + (1 - z) * hbar
            h[:] = new
            out_ref[j] = new

    call = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((U, B, 3 * S), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2 * S), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, S), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((U, B, S), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, B, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, S), jnp.float32)],
        interpret=jax.default_backend() not in ("tpu",),
    )

    rs = np.random.RandomState(0)
    xp = jnp.asarray(rs.normal(size=(Tp, B, 3 * S)).astype(np.float32) * 0.1)
    sWT = jnp.asarray(rs.normal(size=(S, 2 * S)).astype(np.float32) * 0.1)
    sW2T = jnp.asarray(rs.normal(size=(S, S)).astype(np.float32) * 0.1)
    fn = jax.jit(lambda a, b, c: call(a, b, c))
    t0 = time.time()
    out = fn(xp, sWT, sW2T)
    float(jnp.sum(out))
    print("U=%-2d prec=%s compile+run %.1f s"
          % (U, precision, time.time() - t0), flush=True)
    reps = 20
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(xp, sWT, sW2T)
        float(jnp.sum(out))
        ts.append((time.time() - t0) / reps)
    print("U=%-2d prec=%-8s %7.2f ms (%.2f us/step)"
          % (U, precision, min(ts) * 1e3, min(ts) * 1e6 / T), flush=True)
    return np.asarray(out)


def main():
    args = sys.argv[1:]
    cases = [int(a) for a in args] or [1, 2, 4, 8]

    import jax
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda: jnp.ones(4))())
    base = run_case(1)
    for U in cases:
        if U == 1:
            continue
        out = run_case(U)
        print("U=%-2d parity vs U=1: %s" %
              (U, "EXACT" if np.array_equal(base, out[:base.shape[0]])
               else "max|d|=%.3g" % np.abs(base - out[:base.shape[0]]).max()),
              flush=True)
    # the cheap-precision variant: are DEFAULT bf16 state matmuls faster
    # in-kernel now that timings are clean?
    run_case(1, precision="default")
    run_case(4, precision="default")
    return 0


if __name__ == "__main__":
    sys.exit(main())
