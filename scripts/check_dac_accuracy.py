"""Isolate the accuracy effect of posterior streaming dtype and input mode.

Basecalls the unique bundled reads in four configurations (signal/dac input
x f32/bf16 posterior streaming) under bf16 compute and reports mean
alignment accuracy for each.

    python scripts/check_dac_accuracy.py
"""
import glob
import os
import sys

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

import numpy as np

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    import jax
    import jax.numpy as jnp
    from sloika_tpu import align
    from sloika_tpu import basecall as bc
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.data.fast5 import Fast5

    np.asarray(jax.jit(lambda: jnp.ones(4))())
    layer, params = theano_pickle.load_model(PRETRAINED)

    sigs, dacs, refs, names = [], [], {}, []
    for fn in sorted(glob.glob(READS + "/*.fast5")):
        a = bc.load_raw_signal(fn)
        b = bc.load_raw_dac(fn)
        if a is None or b is None:
            continue
        try:
            with Fast5(fn) as f5:
                ref = f5.get_reference_fasta()
        except Exception:
            continue
        name = os.path.basename(fn)
        names.append(name)
        sigs.append(a[1])
        dacs.append((b[1], b[2]))
        refs[name] = b"".join(l for l in ref.splitlines()
                              if not l.startswith(b">")).decode()

    for mode in ("sig-f32", "sig-bf16", "dac-f32", "dac-bf16"):
        inp, pdt = mode.split("-")
        caller = bc.Basecaller(
            layer, params, 5, batch_size=512, chunked=True, chunk_size=16384,
            overlap=400, output="bases",
            post_dtype="float32" if pdt == "f32" else "bfloat16")
        out = (caller.basecall_dac_reads(dacs) if inp == "dac"
               else caller.basecall_signals(sigs))
        seqs = {n: "".join("ACGT"[c] for c in o[1])
                for n, o in zip(names, out)}
        rows = align.evaluate_basecalls(seqs, refs)
        acc = float(np.mean([r["accuracy"] for r in rows])) if rows else 0.0
        print("%-9s mean accuracy %.4f  (%d reads, %d bases)" %
              (mode, acc, len(rows), sum(len(s) for s in seqs.values())),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
