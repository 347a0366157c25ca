"""Sub-stage timing of the banded remap device program (TPU, run solo):
forward / emission pregather / banded forward kernel / backtrack.
"""
import glob
import sys
import time

import numpy as np

PRETRAINED = "/root/reference/models/pretrained.pkl"
READS = "/root/reference/data/reads"


def timed(fn, *args, n=3):
    out = fn(*args)
    jax_sync(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax_sync(out)
        ts.append(time.time() - t0)
    return min(ts), out


def jax_sync(out):
    import jax.numpy as jnp
    leaves = [l for l in __import__("jax").tree_util.tree_leaves(out)
              if hasattr(l, "dtype")]
    s = leaves[0]
    float(jnp.asarray(s).reshape(-1)[0])


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from sloika_tpu import basecall as bc, bio, util
    from sloika_tpu.compat import theano_pickle
    from sloika_tpu.data.fast5 import Fast5
    from sloika_tpu.config import sloika_dtype
    from sloika_tpu.basecall import bucket_length
    from sloika_tpu.ops import remap_banded
    from sloika_tpu.ops.pallas import remap as pr

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
    for b, s in enumerate(seqs):
        seq_states[b, :len(s)] = s
        pos_mask[b, :len(s)] = True
    p0 = np.zeros((B, P), np.float32)
    p1 = np.zeros((B, P), np.float32)

    W = 512
    xd = jax.device_put(jnp.asarray(x))
    ld = jnp.asarray(lengths)
    sd = jnp.asarray(seq_states)
    md = jnp.asarray(pos_mask)
    p0d, p1d = jnp.asarray(p0), jnp.asarray(p1)

    @jax.jit
    def forward(params, x, lengths):
        post, out_lengths = layer.apply_with_lengths(params, x, lengths)
        post = 1e-5 + (1 - 1e-5) * post
        lt = jnp.log(post)
        return jnp.moveaxis(lt, 1, 0), out_lengths   # (B, T', nstate)

    dt, (ltb, ol) = timed(forward, params, xd, ld)
    Tq = ltb.shape[1]
    print("forward ({} frames): {:.0f} ms".format(Tq, dt * 1e3))

    @partial(jax.jit, static_argnames=("W",))
    def pregather(ltrans, seq_states, pos_mask, p0, p1, nframes, npos, W):
        B, T, nstate = ltrans.shape
        Pp = seq_states.shape[1]
        starts = remap_banded.band_starts(nframes, npos, T, W)
        d = jnp.diff(starts, axis=0, prepend=starts[0:1])
        warange = jnp.arange(W, dtype=jnp.int32)
        idx = starts[:, :, None] + warange[None, None, :]
        idx_c = jnp.clip(idx, 0, Pp - 1)
        flat = jnp.moveaxis(idx_c, 1, 0).reshape(B, T * W)

        def row_gather(arr):
            g = jnp.take_along_axis(arr, flat, axis=1)
            return jnp.moveaxis(g.reshape(B, T, W), 1, 0)

        valid = row_gather(pos_mask)
        seq_w = row_gather(seq_states)
        ltrans_t = jnp.moveaxis(ltrans, 1, 0)
        emit = jnp.where(valid, jnp.take_along_axis(ltrans_t, seq_w, axis=2),
                         jnp.float32(-1e30))
        return emit, d, starts

    npos_d = jnp.sum(md, axis=1).astype(jnp.int32)
    dt, (emit, dvec, starts) = timed(
        pregather, ltb, sd, md, p0d, p1d, ol, npos_d, W)
    print("pregather: {:.0f} ms".format(dt * 1e3))

    dt, (score, path) = timed(
        partial(pr.map_to_sequence_banded, W=W),
        ltb, sd, jnp.float32(5.0), p0d, p1d, md, ol, npos_d)
    print("full banded map_to_sequence: {:.0f} ms".format(dt * 1e3))
    return 0


if __name__ == "__main__":
    sys.exit(main())
