"""Remap throughput micro-bench: bundled reads vs their in-file references.

Measures steady-state samples/s of the batched device remap path
(forward + map-to-sequence DP) for a given band configuration; used for the
STATUS.md numbers.  Run ON TPU (one TPU process at a time):

    python scripts/bench_remap.py [band|exact|xla] [batch_size]

The workload mirrors the reference remap recipe
(/root/reference/scripts/example_training.sh:24-31, "takes a few hours" on
a multi-core CPU for a read set).
"""
import glob
import sys
import time

import numpy as np

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    from sloika_tpu import basecall as bc
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.data.fast5 import Fast5
    from sloika_tpu.remap import Remapper

    np.asarray(jax.jit(lambda: jax.numpy.ones(4))())   # warm transfer path

    sigs, refs = [], []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_signal(fn)
        if r is None:
            continue
        with Fast5(fn) as f5:
            try:
                ref = f5.get_reference_fasta()
            except Exception:
                continue
        seq = b"".join(l for l in ref.splitlines() if not l.startswith(b">"))
        if len(seq) < 100:
            continue
        sigs.append(r[1])
        refs.append(seq)
    # tile the bundled 5-read set to fill whole device batches — otherwise
    # a B=16 batch runs 11 empty lanes and the samples/s number reflects
    # batch underfill, not chip capability
    if len(sigs) < batch:
        n = -(-batch // len(sigs)) * len(sigs) * 2
        reps = n // len(sigs)
        sigs = sigs * reps
        refs = refs * reps
    print("{} reads, {} samples, {} ref bases".format(
        len(sigs), sum(len(s) for s in sigs), sum(len(r) for r in refs)))

    noretry = mode.endswith("-nr")
    if noretry:
        mode = mode[:-3]
    band = {"exact": None, "auto": "auto", "xla": 512}.get(mode)
    if mode not in ("exact", "auto", "xla"):
        band = int(mode)
    layer, params = theano_pickle.load_model(PRETRAINED)
    remapper = Remapper(layer, params, 5, batch_size=batch, band=band)
    if noretry:
        remapper.fallback = False

    t0 = time.time()
    out = remapper.remap_signals(sigs, refs)
    print("cold (compile+run): {:.1f} s".format(time.time() - t0))

    nrep = 3
    t0 = time.time()
    for _ in range(nrep):
        out = remapper.remap_signals(sigs, refs)
    dt = (time.time() - t0) / nrep
    nsamples = sum(len(s) for s in sigs)
    ok = sum(1 for o in out if o is not None)
    print("band={} B={}: {:.2f} s/pass, {:.0f} samples/s, {:.2f} reads/s, "
          "{} remapped".format(remapper.band, batch, dt, nsamples / dt,
                               len(sigs) / dt, ok))
    for i, o in enumerate(out):
        if o is not None:
            score, table, path, seq = o
            print("  read{}: score {:.1f}, {} events, path [{}..{}]".format(
                i, score, len(table), path.min(), path.max()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
