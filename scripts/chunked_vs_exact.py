"""Per-read chunked-vs-exact basecall accuracy table (VERDICT r4 #6).

The production bench basecalls in chunked overlap-stitch mode; the stitch
is *exactness-tested* for overlapping windows, but chunk seams can still
change calls near window boundaries (the DP sees a truncated past).  This
measures the accuracy cost per scorable bundled read, in the production
configuration (bf16 compute policy, pallas decode on TPU; xla on CPU).

Usage: python scripts/chunked_vs_exact.py [out.json]
"""
import json
import os
import sys

os.environ.setdefault("SLOIKA_TPU_COMPUTE_DTYPE", "bfloat16")

import numpy as np

sys.path.insert(0, "/root/repo")

READS = "/root/reference/data/reads"
SCORABLE = ["read2", "read4", "read5", "read6"]
KLEN = 5


def main():
    import jax
    from sloika_tpu import align, basecall as bc
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.data.fast5 import Fast5
    import jax.numpy as jnp
    print("backend:", jax.default_backend())
    np.asarray(jax.jit(lambda: jnp.ones(4))())   # d2h warmup

    layer, params = theano_pickle.load_model(
        "/root/reference/models/pretrained.pkl")
    dacs, sigs, refs = [], [], {}
    for name in SCORABLE:
        fn = os.path.join(READS, name + ".fast5")
        dac = bc.load_raw_dac(fn)
        dacs.append((name, dac[1], dac[2]))
        sigs.append(bc.load_raw_signal(fn)[1])
        with Fast5(fn) as f5:
            # get_reference_fasta already strips the header/newlines
            refs[name] = f5.get_reference_fasta().decode()

    def call_chunked(chunk_size=16384, overlap=400):
        # the production bench configuration (DAC wire, bases on device)
        caller = bc.Basecaller(layer, params, KLEN, batch_size=4,
                               chunked=True, chunk_size=chunk_size,
                               overlap=overlap, output="bases")
        out = caller.basecall_dac_reads([(d, m) for _, d, m in dacs])
        return {name: None if res is None else
                "".join("ACGT"[c] for c in res[1])
                for (name, _, _), res in zip(dacs, out)}

    def call_exact():
        # whole-read scan, no windows/stitch: the accuracy reference point
        # (basecall_to_sequences does the production kmer-path collapse)
        caller = bc.Basecaller(layer, params, KLEN, batch_size=4)
        out = caller.basecall_to_sequences(sigs)
        return {name: None if res is None else
                "".join("ACGT"[c] for c in res[1])
                for (name, _, _), res in zip(dacs, out)}

    exact = call_exact()
    variants = {"chunked_c16384": call_chunked(16384, 400),
                "chunked_c32768": call_chunked(32768, 400)}
    rows = []
    for name in SCORABLE:
        row = {"read": name}
        for tag, seqs in [("exact", exact)] + list(variants.items()):
            seq = seqs[name]
            m = None if seq is None else align.accuracy_metrics(
                name, seq, name, refs[name])
            row[tag] = None if m is None else round(float(m["accuracy"]), 4)
            row[tag + "_bases"] = 0 if seq is None else len(seq)
        for tag in variants:
            row["delta_" + tag] = (
                None if None in (row["exact"], row[tag])
                else round(row[tag] - row["exact"], 4))
        rows.append(row)
        print(row)
    summary = {"config": "B=4 overlap=400 bf16", "reads": rows}
    for tag in variants:
        deltas = [r["delta_" + tag] for r in rows
                  if r["delta_" + tag] is not None]
        summary["mean_delta_" + tag] = round(float(np.mean(deltas)), 4)
        summary["worst_delta_" + tag] = round(float(np.min(deltas)), 4)
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chunked_vs_exact.json"
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("summary:", json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
