"""Stage-level timing of the chunked basecall pipeline on TPU (run solo).

Times, per 512-window batch at the bench configuration: the model forward
(conv + GRUs + softmax), the Pallas Viterbi, the device-side base collapse,
and the host transfer, to locate the next optimisation target.

    python scripts/profile_basecall.py [batch] [chunk]
"""
import glob
import os
import sys
import time

import numpy as np

# production posterior policy; the default f32 policy OOMs the B=1024
# fused program at REMOTE COMPILE (CLAUDE.md)
os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def sync(x):
    # block_until_ready does not sync through the tunnel; force a scalar
    import jax.numpy as jnp
    float(jnp.sum(x[0] if isinstance(x, (tuple, list)) else x)
          .astype(jnp.float32))


def timed(label, fn, *args, n=3, reps=6):
    """Dispatch ``reps`` async calls per sync: the tunnel's sync round-trip
    is ~32 ms (scripts/bench_dma_calib.py), comparable to whole stages, so
    per-call syncs would swamp the stage times."""
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        ts.append((time.time() - t0) / reps)
    print("{:24s} {:8.1f} ms (best of {}x{}; mean {:.1f})".format(
        label, min(ts) * 1e3, n, reps, np.mean(ts) * 1e3))
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    import jax
    import jax.numpy as jnp
    from sloika_tpu import basecall as bc
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.ops.pallas import viterbi as pv
    from sloika_tpu.config import sloika_dtype

    np.asarray(jax.jit(lambda: jnp.ones(4))())

    layer, params = theano_pickle.load_model(PRETRAINED)
    reads = []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_signal(fn)
        if r is not None:
            reads.append(r[1])

    # fill a (C, B) window batch by tiling read windows
    x = np.zeros((C, B, 1), dtype=sloika_dtype)
    i = 0
    for r in range(B):
        s = reads[i % len(reads)]
        off = (r * 4096) % max(1, len(s) - C)
        w = s[off:off + C]
        x[:len(w), r, 0] = w
        i += 1
    lengths = np.full(B, C, np.int32)

    klen, skip, min_prob = 5, 5.0, 1e-5

    # stage-split timings hold the full posterior (and a floored copy) in
    # HBM, which OOMs at the production batch; run them at a reduced batch
    # and scale mentally — the fused production program below runs at B.
    Bs = min(B, 128)
    xs, lens_s = jnp.asarray(x[:, :Bs]), jnp.asarray(lengths[:Bs])
    print("stage timings at batch {}; fused program at batch {}".format(Bs, B))

    fwd = jax.jit(lambda p, xx, ll: layer.apply_with_lengths(p, xx, ll)[0])
    post = timed("forward", fwd, params, xs, lens_s)

    def prep(pp):
        return min_prob + (1.0 - min_prob) * pp
    post_t = jax.jit(prep)(post)
    sync(post_t)

    # production layout: time-major input, log taken in-kernel
    vit = jax.jit(lambda pb: pv.viterbi(pb, klen, skip_pen=skip,
                                        time_major=True))
    score, path, moved = timed("viterbi (pallas)", vit, post_t)

    f_splits = (400 // 5, (C - 400) // 5)
    coll = jax.jit(lambda p, m: bc._move_records(p, m, klen, f_splits))
    first, counts, recs = timed("collapse+pack", coll, path, moved)

    t0 = time.time()
    counts_np = np.asarray(counts)
    nmax = int(counts_np[:, 2].max())
    L = max(1, -(-nmax // 4))
    recs_np = np.asarray(recs[:, :L])
    _ = np.asarray(first)
    print("{:24s} {:8.1f} ms ({} KB)".format(
        "transfer (packed)", (time.time() - t0) * 1e3,
        (recs_np.nbytes + counts_np.nbytes) // 1024))

    # free the stage buffers before the full-batch fused run (the held
    # posterior copies otherwise OOM HBM at the production batch)
    del post, post_t, path, moved, score, first, counts, recs
    import gc
    gc.collect()

    # end-to-end fused program (what production runs)
    caller = bc.Basecaller(layer, params, klen, batch_size=B, chunked=True,
                           chunk_size=C, overlap=400, output="bases")
    run = caller._forward_decode(C)

    def full(p, xx, ll):
        return run(p, xx, ll)
    timed("fused fwd+vit+collapse", full, params, jnp.asarray(x),
          jnp.asarray(lengths))
    nsamp = B * C
    print("batch = {} windows x {} samples = {:.2f} Msamples".format(
        B, C, nsamp / 1e6))
    return 0


if __name__ == "__main__":
    sys.exit(main())
