"""Measure achievable HBM->VMEM DMA bandwidth from a Pallas kernel.

The production DP kernels stream (T, B, K) posteriors through Pallas's
automatic per-grid-step pipeline and observe only ~30-70 GB/s effective.
This kernel bypasses the auto-pipeline: the input stays in HBM (pl.ANY)
and the body issues manual async copies of ``rows`` grid rows at a time
into an ``nslots``-deep VMEM ring, accumulating a max over each chunk so
nothing is dead-code-eliminated.

    python scripts/bench_dma.py [rows,nslots ...] [--batch B] [--T T]
"""
import sys
import time
from functools import partial

import numpy as np


def run_case(rows, nslots, B, T, K=1024):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunk = T // rows
    Tr = nchunk * rows

    def kernel(hbm_ref, out_ref, scratch, acc, sems):
        def get_dma(slot, chunk):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(chunk * rows, rows)],
                scratch.at[slot],
                sems.at[slot],
            )

        for s in range(min(nslots, nchunk)):
            get_dma(s, s).start()
        acc[:] = jnp.full((B, K), -np.inf, jnp.float32)

        def body(chunk, _):
            slot = jax.lax.rem(chunk, nslots)

            @pl.when(chunk + nslots < nchunk)
            def _():
                get_dma(slot, chunk + nslots).start()

            get_dma(slot, chunk).wait()
            acc[:] = jnp.maximum(acc[:], jnp.max(scratch[slot], axis=0))
            return ()

        jax.lax.fori_loop(0, nchunk, body, ())
        out_ref[:] = acc[:]

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslots, rows, B, K), jnp.float32),
            pltpu.VMEM((B, K), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() not in ("tpu",),
    )

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(Tr, B, K).astype(np.float32))
    nbytes = Tr * B * K * 4
    fn = jax.jit(call)
    t0 = time.time()
    out = fn(x)
    float(jnp.sum(out))
    print("rows=%-3d slots=%d compile+run %.1f s" %
          (rows, nslots, time.time() - t0), flush=True)
    # amortise the ~32 ms tunnel sync round-trip over several dispatches
    reps = 8
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(x)
        float(jnp.sum(out))
        ts.append((time.time() - t0) / reps)
    dt = min(ts)
    print("rows=%-3d slots=%d %8.1f ms -> %6.1f GB/s (chunk %.2f MB)" %
          (rows, nslots, dt * 1e3, nbytes / dt / 1e9,
           rows * B * K * 4 / 1e6), flush=True)


def main():
    args = list(sys.argv[1:])
    B, T = 128, 3264
    if "--batch" in args:
        i = args.index("--batch")
        B = int(args[i + 1]); del args[i:i + 2]
    if "--T" in args:
        i = args.index("--T")
        T = int(args[i + 1]); del args[i:i + 2]
    cases = args or ["1,2", "1,8", "8,4", "32,3"]

    import jax
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda: jnp.ones(4))())
    for c in cases:
        rows, nslots = (int(v) for v in c.split(","))
        run_case(rows, nslots, B, T)
    return 0


if __name__ == "__main__":
    sys.exit(main())
