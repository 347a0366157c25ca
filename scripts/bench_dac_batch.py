"""Sweep device batch size for the DAC basecall path.

One 512-window batch serialises input wire -> compute -> pull through the
tunnel; smaller batches can pipeline the next batch's transfer under the
current batch's compute *if* the tunnel overlaps them.  Measures end-to-end
repetition time per batch size.

    python scripts/bench_dac_batch.py [sizes...]
"""
import glob
import os
import sys
import time

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

import numpy as np

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [512, 256, 128]

    import jax
    import jax.numpy as jnp
    from sloika_tpu import basecall as bc
    from sloika_tpu.compat import theano_pickle

    np.asarray(jax.jit(lambda: jnp.ones(4))())
    layer, params = theano_pickle.load_model(PRETRAINED)

    reads = []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_dac(fn)
        if r is not None:
            reads.append((r[1], r[2]))
    sigs = (reads * 31)[:150]
    nsamples = sum(len(d) for d, _ in sigs)

    for B in sizes:
        caller = bc.Basecaller(layer, params, 5, batch_size=B, chunked=True,
                               chunk_size=16384, overlap=400, output="bases")
        t0 = time.time()
        out = caller.basecall_dac_reads(sigs)
        print("B=%-4d compile+run %.1f s" % (B, time.time() - t0), flush=True)
        nbases = sum(len(c[1]) for c in out if c is not None)
        ts = []
        for _ in range(4):
            t0 = time.time()
            caller.basecall_dac_reads(sigs)
            ts.append(time.time() - t0)
        dt = min(ts)
        print("B=%-4d %6.0f ms (mean %.0f) -> %.0f bases/s, %.1f Msamples/s"
              % (B, dt * 1e3, np.mean(ts) * 1e3, nbases / dt,
                 nsamples / dt / 1e6), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
