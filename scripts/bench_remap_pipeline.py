"""Interleaved A/B of remap cross-batch pipelining (VERDICT r3 #2).

One process, one Remapper (shared compiled programs): alternate
pipeline-on / pipeline-off repetitions of the bench remap workload
(bundled reads tiled to several batch-64 dispatches, DAC wire, banded
Pallas DP) so tunnel weather hits both arms equally.  Run ON TPU, solo:

    python scripts/bench_remap_pipeline.py [nrep] [batch] [ngroups]
"""
import glob
import os
import sys
import time

import numpy as np

# production compute policy (CLAUDE.md: set BEFORE importing sloika_tpu)
os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    nrep = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    ngroups = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    from sloika_tpu import basecall as bc
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.data.fast5 import Fast5
    from sloika_tpu.remap import Remapper

    np.asarray(jax.jit(lambda: jax.numpy.ones(4))())

    sigs, refs = [], []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_dac(fn)
        if r is None:
            continue
        try:
            with Fast5(fn) as f5:
                ref = f5.get_reference_fasta()
        except Exception:
            continue
        seq = b"".join(l for l in ref.splitlines() if not l.startswith(b">"))
        if len(seq) < 100:
            continue
        sigs.append((r[1], r[2]))
        refs.append(seq)
    reps = -(-batch * ngroups // len(sigs))
    sigs, refs = sigs * reps, refs * reps
    nsamples = sum(len(s) for s, _ in sigs)
    print("{} reads, {} samples, {} groups of {}".format(
        len(sigs), nsamples, ngroups, batch))

    layer, params = theano_pickle.load_model(PRETRAINED)
    rm = Remapper(layer, params, 5, batch_size=batch)
    rm.remap_dac_signals(sigs, refs)            # compile + warm

    results = {True: [], False: []}
    for rep in range(nrep):
        for pipe in (True, False) if rep % 2 == 0 else (False, True):
            rm.pipeline = pipe
            t0 = time.time()
            out = rm.remap_dac_signals(sigs, refs)
            dt = time.time() - t0
            assert all(o is not None for o in out)
            results[pipe].append(dt)
            print("rep {} pipeline={}: {:.3f}s ({:.2f}M samples/s)".format(
                rep, pipe, dt, nsamples / dt / 1e6), flush=True)

    on = min(results[True])
    off = min(results[False])
    print("BEST pipeline-on:  {:.3f}s  ({:.2f}M samples/s)".format(
        on, nsamples / on / 1e6))
    print("BEST pipeline-off: {:.3f}s  ({:.2f}M samples/s)".format(
        off, nsamples / off / 1e6))
    print("speedup: {:.3f}x  (means {:.3f}x)".format(
        off / on, (sum(results[False]) / nrep) / (sum(results[True]) / nrep)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
