"""Bisect the Viterbi kernel's per-step cost with stripped-down variants.

Each variant is a self-contained Pallas kernel with the same grid/BlockSpec
shape as the production kernel but parts of the DP body removed, so the
difference between successive variants prices one component.

    python scripts/bench_viterbi_parts.py [variant ...] [--batch B] [--T T]
"""
import sys
import time
from functools import partial

import numpy as np

VARIANTS = ("noop", "nolog", "f32store", "copy", "maxstay", "reduce",
            "expand", "full")


def make_kernel(variant, B, K, nstep):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nrem = K // nstep

    def kernel(lpk_ref, lps_ref, e_ref, tb_ref, vf_ref, vscore):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            vscore[:] = lpk_ref[0]
            tb_ref[0] = jnp.zeros((B, K), jnp.int8)

        @pl.when(t > 0)
        def _step():
            if variant == "noop":
                # input DMA still happens; store a constant: prices the
                # grid + DMA machinery alone
                tb_ref[0] = jnp.zeros((B, K), jnp.int8)
                return
            if variant == "nolog":
                # copy without the transcendental: prices the log
                p = vscore[:]
                vscore[:] = p + lps_ref[0]
                tb_ref[0] = lpk_ref[0].astype(jnp.int8)
                return
            lpk = jnp.log(lpk_ref[0] + 1e-10)
            lps = jnp.log(lps_ref[0] + 1e-10)
            p = vscore[:]
            if variant == "f32store":
                # copy but the traceback row stays f32 (stored into the
                # scratch instead): prices the f32->int8 pack+store by
                # comparison with "copy" (no tb write at all here, so it
                # also bounds the tb-store cost from above)
                vscore[:] = p + lps + lpk
                tb_ref[0] = jnp.zeros((B, K), jnp.int8)
                return
            if variant == "copy":
                # DMA + log + one add + int8 store, no DP
                vscore[:] = p + lps
                tb_ref[0] = lpk.astype(jnp.int8)
                return
            if variant == "maxstay":
                # + the stay compare/select chain at full (B, K) width
                new = lpk + p
                code = jnp.where(new > p + lps, jnp.float32(1),
                                 jnp.float32(-1))
                vscore[:] = jnp.maximum(new, p + lps)
                tb_ref[0] = code.astype(jnp.int8)
                return
            # group reduce (aligned 256-lane slices)
            mx = p[:, 0:nrem]
            am = jnp.zeros((B, nrem), jnp.float32)
            for g in range(1, nstep):
                cand = p[:, g * nrem:(g + 1) * nrem]
                better = cand > mx
                mx = jnp.where(better, cand, mx)
                am = jnp.where(better, jnp.float32(g), am)
            if variant == "reduce":
                # reduce done, but expansion replaced by a cheap broadcast
                # of the first nrem lanes (wrong math, same data volume)
                score = jnp.concatenate([mx] * nstep, axis=1)
                group = jnp.concatenate([am] * nstep, axis=1)
            else:
                score = jnp.dot(mx, e_ref[:],
                                preferred_element_type=jnp.float32,
                                precision="highest")
                group = jnp.dot(am, e_ref[:],
                                preferred_element_type=jnp.float32)
            new = lpk + score
            code = jnp.where(new > p + lps, group, jnp.float32(-1))
            vscore[:] = jnp.maximum(new, p + lps)
            tb_ref[0] = code.astype(jnp.int8)

    return kernel


def run_variant(variant, B, T, K=1024, nstep=4):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = make_kernel(variant, B, K, nstep)
    e = np.zeros((K // nstep, K), np.float32)
    e[np.arange(K) // nstep, np.arange(K)] = 1.0

    call = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, K), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // nstep, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, K), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, K), jnp.int8),
            jax.ShapeDtypeStruct((B, K), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, K), jnp.float32)],
        interpret=jax.default_backend() not in ("tpu",),
    )

    rs = np.random.RandomState(0)
    post = jnp.asarray(
        rs.dirichlet(np.full(K, 0.05), size=(T, B)).astype(np.float32))
    stay = jnp.asarray(rs.rand(T, B, 1).astype(np.float32))
    fn = jax.jit(lambda p, s: call(p, s, jnp.asarray(e)))
    t0 = time.time()
    tb, vf = fn(post, stay)
    float(jnp.sum(vf))
    print("%-10s compile+run %.1f s" % (variant, time.time() - t0),
          flush=True)
    # The tunnel's sync round-trip is ~32 ms — comparable to the whole
    # kernel runtime — so each timing dispatches ``reps`` async calls and
    # syncs once, dividing the RTT across them.
    reps = 8
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            tb, vf = fn(post, stay)
        float(jnp.sum(vf))
        ts.append((time.time() - t0) / reps)
    print("%-10s %7.1f ms (best of 3x%d; mean %.1f; %.2f us/step)" %
          (variant, min(ts) * 1e3, reps, np.mean(ts) * 1e3,
           min(ts) * 1e6 / T), flush=True)


def main():
    args = list(sys.argv[1:])
    B, T = 128, 3277
    if "--batch" in args:
        i = args.index("--batch")
        B = int(args[i + 1]); del args[i:i + 2]
    if "--T" in args:
        i = args.index("--T")
        T = int(args[i + 1]); del args[i:i + 2]
    variants = args or list(VARIANTS)

    import jax
    import jax.numpy as jnp
    np.asarray(jax.jit(lambda: jnp.ones(4))())
    for v in variants:
        run_variant(v, B, T)
    return 0


if __name__ == "__main__":
    sys.exit(main())
