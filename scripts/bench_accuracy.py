"""Accuracy A/B at the bench configuration.

Basecalls the unique bundled reads at the headline bench configuration
(chunked C=16384, V=400, output="bases") and reports mean alignment
accuracy, so the bf16-vs-f32 trade and any decode-path change can be
checked in isolation from throughput noise.

Usage: SLOIKA_TPU_COMPUTE_DTYPE=float32 python scripts/bench_accuracy.py
"""
import glob
import os
import sys

import numpy as np

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    import jax
    import jax.numpy as jnp
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu import align
    from sloika_tpu import basecall as bc
    from sloika_tpu.data.fast5 import Fast5

    np.asarray(jax.jit(lambda: jnp.ones((4,)))())
    layer, params = theano_pickle.load_model(PRETRAINED)
    caller = bc.Basecaller(layer, params, 5, batch_size=512, chunked=True,
                           chunk_size=16384, overlap=400, output="bases")

    refs, seqs = {}, {}
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        r = bc.load_raw_signal(fn)
        if r is None:
            continue
        try:
            with Fast5(fn) as f5:
                ref = f5.get_reference_fasta()
        except Exception:
            continue
        name = os.path.basename(fn)
        score, codes = caller.basecall_to_sequences([r[1]])[0]
        refs[name] = b"".join(
            l for l in ref.splitlines() if not l.startswith(b">")).decode()
        seqs[name] = "".join("ACGT"[c] for c in codes)
    rows = align.evaluate_basecalls(seqs, refs)
    from sloika_tpu.config import sloika_dtype
    for r in rows:
        print("%s  acc %.4f  len %d"
              % (r["query"], r["accuracy"], len(seqs[r["query"]])))
    print("dtype=%s  mean accuracy %.4f over %d reads"
          % (np.dtype(sloika_dtype).name, float(np.mean([r["accuracy"] for r in rows])), len(rows)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
