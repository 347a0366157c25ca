"""Break the headline bench repetition into host / h2d / device / d2h parts.

The fused device program runs 8.39 Msamples in ~150 ms, yet a bench rep
takes ~1 s: this script times each phase of Basecaller._basecall_chunked_bases
to locate where the other ~850 ms goes (host array build, input transfer,
dispatch, output pull, host assembly).

    python scripts/profile_bench_host.py [batch] [chunk]
"""
import glob
import sys
import time

import numpy as np

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    import jax
    import jax.numpy as jnp
    from sloika_tpu import basecall as bc
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.config import sloika_dtype

    np.asarray(jax.jit(lambda: jnp.ones(4))())

    layer, params = theano_pickle.load_model(PRETRAINED)
    reads = []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_signal(fn)
        if r is not None:
            reads.append(r[1])
    sigs = (reads * 31)[:150]
    nsamples = sum(len(s) for s in sigs)

    caller = bc.Basecaller(layer, params, 5, batch_size=B, chunked=True,
                           chunk_size=C, overlap=400, output="bases")
    out = caller.basecall_signals(sigs)   # compile + warm
    nbases = sum(len(c[1]) for c in out if c is not None)
    print("reads %d  samples %.2fM  bases %.2fM" %
          (len(sigs), nsamples / 1e6, nbases / 1e6), flush=True)

    # h2d bandwidth probe: one bench-size input array
    x = np.zeros((C, B, 1), dtype=sloika_dtype)
    for rep in range(3):
        t0 = time.time()
        xd = jnp.asarray(x)
        xd.block_until_ready()
        # force a real sync: pull one element
        float(xd[0, 0, 0])
        dt = time.time() - t0
        print("h2d %.1f MB: %.0f ms -> %.1f MB/s" %
              (x.nbytes / 1e6, dt * 1e3, x.nbytes / dt / 1e6), flush=True)

    # phase-split of the real call
    V = caller.overlap
    core = C - 2 * V
    jobs = []
    for r, s in enumerate(sigs):
        L = len(s)
        nwin = max(1, -(-max(L - 2 * V, 1) // core))
        for w in range(nwin):
            start = w * core
            sl = s[start:start + C]
            jobs.append((r, w, start, sl, len(sl)))
    print("windows: %d" % len(jobs), flush=True)

    run = caller._forward_decode(C)
    for rep in range(3):
        t_build = t_feed = t_disp = 0.0
        inflight = []
        t_all = time.time()
        for lo in range(0, len(jobs), B):
            batch = jobs[lo:lo + B]
            nb = len(batch)
            Bp = bc.bucket_batch(nb, B, 1)
            t0 = time.time()
            x = np.zeros((C, Bp, 1), dtype=sloika_dtype)
            lengths = np.ones(Bp, dtype=np.int32)
            for b, (_, _, _, sl, ln) in enumerate(batch):
                x[:ln, b, 0] = sl
                lengths[b] = ln
            t_build += time.time() - t0
            t0 = time.time()
            xd = jnp.asarray(x)
            ld = jnp.asarray(lengths)
            t_feed += time.time() - t0
            t0 = time.time()
            outs = run(caller.params, xd, ld)
            t_disp += time.time() - t0
            inflight.append(outs)
        # sync device completion (scalar pull of last score)
        t0 = time.time()
        float(jnp.sum(inflight[-1][1]))
        t_sync = time.time() - t0
        # pull outputs
        t0 = time.time()
        for _, score, first, counts, recs in inflight:
            counts_np = np.asarray(counts)
            nmax = int(counts_np[:, 2].max())
            L = max(1, -(-nmax // 4))
            np.asarray(recs[:, :L])
            np.asarray(first)
            np.asarray(score)
        t_pull = time.time() - t0
        total = time.time() - t_all
        print("rep%d total %.0f ms: build %.0f feed %.0f dispatch %.0f "
              "sync %.0f pull %.0f other %.0f" %
              (rep, total * 1e3, t_build * 1e3, t_feed * 1e3, t_disp * 1e3,
               t_sync * 1e3, t_pull * 1e3,
               (total - t_build - t_feed - t_disp - t_sync - t_pull) * 1e3),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
