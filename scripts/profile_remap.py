"""Stage-level timing of the banded remap path on TPU (run solo).

Splits one steady-state remap batch into upload / device compute / download
/ host-table stages to locate the bottleneck (tunnel bandwidth vs kernel).
"""
import glob
import sys
import time

import numpy as np

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def main():
    import jax
    import jax.numpy as jnp
    from sloika_tpu import basecall as bc, bio, util
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.data.fast5 import Fast5
    from sloika_tpu.remap import Remapper
    from sloika_tpu.config import sloika_dtype
    from sloika_tpu.basecall import bucket_length

    np.asarray(jax.jit(lambda: jnp.ones(4))())

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

    layer, params = theano_pickle.load_model(PRETRAINED)
    rm = Remapper(layer, params, 5, batch_size=8, band=512)
    rm.fallback = False

    # replicate _run_batch staging manually
    B = len(sigs)
    lengths = np.array([len(s) for s in sigs], dtype=np.int32)
    T = bucket_length(int(lengths.max()))
    x = np.zeros((T, B, 1), dtype=sloika_dtype)
    for b, s in enumerate(sigs):
        x[:len(s), b] = s.reshape(-1, 1)
    seqs = [bio.kmer_state_array(r, 5) + 1 for r in refs]
    npos = np.array([len(s) for s in seqs], dtype=np.int32)
    P = bucket_length(int(npos.max()), min_len=256)
    seq_states = np.zeros((B, P), dtype=np.int32)
    pos_mask = np.zeros((B, P), dtype=bool)
    p0 = np.zeros((B, P), dtype=np.float32)
    p1 = np.zeros((B, P), dtype=np.float32)
    for b, s in enumerate(seqs):
        n = len(s)
        seq_states[b, :n] = s
        pos_mask[b, :n] = True
        p0[b, :n] = util.geometric_prior(n, 25.0)
        p1[b, :n] = util.geometric_prior(n, 25.0, rev=True)

    run = rm._program(T, P, 512)
    # warm/compile
    out_lengths, score, path = run(rm.params, jnp.asarray(x),
                                   jnp.asarray(lengths),
                                   jnp.asarray(seq_states),
                                   jnp.asarray(pos_mask), jnp.asarray(p0),
                                   jnp.asarray(p1), jnp.float32(5.0))
    float(np.asarray(score).sum())

    for rep in range(3):
        t0 = time.time()
        xd = jax.device_put(jnp.asarray(x))
        sd = jax.device_put(jnp.asarray(seq_states))
        float(jnp.sum(xd[0, :, 0]))   # force upload completion
        t1 = time.time()
        out_lengths, score, path = run(rm.params, xd, jnp.asarray(lengths),
                                       sd, jnp.asarray(pos_mask),
                                       jnp.asarray(p0), jnp.asarray(p1),
                                       jnp.float32(5.0))
        float(np.asarray(score).sum())  # device compute + score download
        t2 = time.time()
        path_np = np.asarray(path)
        ol = np.asarray(out_lengths)
        t3 = time.time()
        from sloika_tpu.remap import build_mapping_table
        for b in range(B):
            build_mapping_table(float(score[b]), path_np[b, :ol[b]],
                                seqs[b], sigs[b], 5, refs[b])
        t4 = time.time()
        print("rep{}: upload {:.0f} ms | compute {:.0f} ms | "
              "path-download({}KB) {:.0f} ms | host-table {:.0f} ms".format(
                  rep, 1e3 * (t1 - t0), 1e3 * (t2 - t1),
                  path_np.nbytes // 1024, 1e3 * (t3 - t2),
                  1e3 * (t4 - t3)))
    print("x upload bytes:", x.nbytes)
    return 0


if __name__ == "__main__":
    sys.exit(main())
