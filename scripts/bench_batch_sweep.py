"""Fused-GRU / end-to-end batch sweep beyond B=512 (VERDICT round-2 #4).

Two questions, answered in ONE process with interleaved A/B reps
(CLAUDE.md: separate bench runs see different tunnel weather and cannot be
compared):

1. forward-only: does the fused-GRU forward get cheaper per sample as the
   window batch widens past 512?  (If yes, the recurrence is latency-bound
   and wider batches ride for free until some memory/bandwidth wall.)
2. end-to-end: does the production DAC basecall improve at B=1024?
   (The round-2 claim that B=512 is optimal coexisted with
   "latency-bound"; this measures it.)

Timing: scalar-pull sync (block_until_ready does not sync via the tunnel),
several dispatches per sync, best-of over interleaved rounds.

Usage: python scripts/bench_batch_sweep.py [out.json]
"""
import glob
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"
C = 16384
FRAMES = C // 5


def main():
    import jax
    import jax.numpy as jnp
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu import basecall as bc

    np.asarray(jax.jit(lambda: jnp.ones(4))())   # warm the transfer path

    layer, params = theano_pickle.load_model(PRETRAINED)
    out = {"forward_only": {}, "end_to_end": {}}

    # ---- forward-only sweep (scalar reduction output: nothing pulled) ----
    fwd = jax.jit(lambda p, x: jnp.sum(layer.apply(p, x),
                                       dtype=jnp.float32))
    # B=2048 x C=16384 exceeds HBM: the (3277, B, 432) f32 input projection
    # of the widest GRU layer alone is 10.8 GB (measured OOM: 20.0 of
    # 15.75 GB).  B=1024 is the widest point at this window size.
    batches = [256, 512, 1024]
    xs = {}
    rs = np.random.RandomState(0)
    for B in batches:
        xs[B] = jnp.asarray(rs.normal(size=(C, B, 1)).astype(np.float32))
        float(fwd(params, xs[B]))              # compile + warm
    NDISP = 4
    times = {B: [] for B in batches}
    for _ in range(4):                          # interleaved rounds
        for B in batches:
            t0 = time.time()
            for _ in range(NDISP):
                r = fwd(params, xs[B])
            float(r)                            # sync
            times[B].append((time.time() - t0) / NDISP)
    for B in batches:
        dt = min(times[B])
        out["forward_only"][B] = {
            "sec_per_dispatch": round(dt, 5),
            "samples_per_sec": round(B * C / dt, 1),
            "us_per_frame": round(1e6 * dt / FRAMES, 3),
        }
        print("fwd B={}: {:.2f} Msamples/s ({:.3f} us/frame)".format(
            B, B * C / dt / 1e6, 1e6 * dt / FRAMES), flush=True)

    # ---- end-to-end DAC basecall sweep -----------------------------------
    reads = []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_dac(fn)
        if r is not None:
            reads.append((r[1], r[2]))
    sweeps = [512, 1024]
    callers = {}
    sigsets = {}
    for B in sweeps:
        callers[B] = bc.Basecaller(layer, params, 5, batch_size=B,
                                   chunked=True, chunk_size=C, overlap=400,
                                   output="bases")
        # enough reads that the window count fills the batch exactly once
        nwin_per_read = sum(-(-len(d) // (C - 800)) for d, _ in reads)
        nreads = -(-B // nwin_per_read) * len(reads)
        sigsets[B] = (reads * (nreads // len(reads) + 1))[:nreads]
        callers[B].basecall_dac_reads(sigsets[B])     # compile + warm
    e2e = {B: [] for B in sweeps}
    for _ in range(4):
        for B in sweeps:
            ns = sum(len(d) for d, _ in sigsets[B])
            t0 = time.time()
            callers[B].basecall_dac_reads(sigsets[B])
            e2e[B].append(ns / (time.time() - t0))
    for B in sweeps:
        out["end_to_end"][B] = {
            "samples_per_sec_best": round(max(e2e[B]), 1),
            "samples_per_sec_all": [round(v, 1) for v in e2e[B]],
        }
        print("e2e B={}: best {:.2f} Msamples/s".format(
            B, max(e2e[B]) / 1e6), flush=True)

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/batch_sweep.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
