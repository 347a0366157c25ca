"""Device-side (XLA) sequence remapping.

Jittable, batched re-expression of ``map_to_sequence``
(/root/reference/sloika/transducer.py:14-73).  The serial Cython slip
recurrence (/root/reference/sloika/viterbi_helpers.pyx:12-35) becomes a
max-plus *prefix scan*: with ``y[k] = x[k] + slip * k``,

    from_score[j] = max_{k <= j-2} (x[k] - slip * (j-1-k))
                  = cummax(y)[j-2] - slip * (j-1)

so the whole slip update is one ``lax.associative_scan`` over positions —
fully parallel on the VPU instead of a length-npos serial loop per event.

Batching convention: one read per batch row, sequences padded to a common
``npos`` with :data:`NEG_LARGE` emission states masked out, events padded
with one-hot stays (neutral, as in decode_jax).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Padding-position score.  Must sit far below any reachable path score:
# path scores are sums of per-event log-probs and reach -10^5..-10^6 for
# long reads (the reference's -50000 constant, transducer.py:5, is NOT
# safe as a mask — an all-uniform posterior over ~13k events already
# scores below it, letting the Viterbi path escape into the padding).
NEG_LARGE = -1.0e30


def slip_update(x, slip):
    """Vectorised geometric-slip scores (single vector; see module doc).

    :param x: (npos,) previous scores
    :returns: (from_score, from_pos) as in the reference kernel: position j
        holds the best ``x[k] - slip*(j-1-k)`` over ``k <= j-2``; entries 0,1
        are -1e38 / 0.
    """
    n = x.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    y = x + slip * idx

    def combine(a, b):
        av, ai = a
        bv, bi = b
        take_b = bv > av  # ties keep the earlier position, like the reference
        return jnp.where(take_b, bv, av), jnp.where(take_b, bi, ai)

    cmax, cpos = jax.lax.associative_scan(
        combine, (y, jnp.arange(n, dtype=jnp.int32)))

    from_score = jnp.full((n,), -1e38, dtype=x.dtype)
    from_pos = jnp.zeros((n,), dtype=jnp.int32)
    from_score = from_score.at[2:].set(cmax[:-2] - slip * (idx[2:] - 1.0))
    from_pos = from_pos.at[2:].set(cpos[:-2])
    return from_score, from_pos


@partial(jax.jit, static_argnames=())
def map_to_sequence(ltrans, seq_states, slip, prior_initial, prior_final,
                    pos_mask):
    """Batched Viterbi alignment of transducer posteriors to known sequences.

    :param ltrans: (B, T, nstate) log posteriors
    :param seq_states: (B, npos) int32 emission state per position (pad
        arbitrary where masked)
    :param slip: scalar slip penalty (>= 0)
    :param prior_initial: (B, npos) log prior over start position (zeros ok)
    :param prior_final: (B, npos) log prior over final position (zeros ok)
    :param pos_mask: (B, npos) True for real positions, False for padding
    :returns: (score (B,), path (B, T) int32 sequence positions)
    """
    B, T, _ = ltrans.shape
    npos = seq_states.shape[1]
    neg = jnp.float32(NEG_LARGE)
    barange = jnp.arange(B)

    ltrans_t = jnp.moveaxis(ltrans, 1, 0)          # (T, B, nstate)
    emit0 = jnp.take_along_axis(ltrans_t[0], seq_states, axis=1)
    pscore = jnp.where(pos_mask,
                       prior_initial + jnp.fmax(emit0, ltrans_t[0][:, 0:1]),
                       neg)

    vslip = jax.vmap(slip_update, in_axes=(0, None))

    def step(pscore, lt):
        emit = jnp.take_along_axis(lt, seq_states, axis=1)   # (B, npos)
        # Stay
        vm = jnp.broadcast_to(jnp.arange(npos, dtype=jnp.int32), (B, npos))
        cscore = pscore + lt[:, 0:1]
        # Step
        step_score = pscore[:, :-1] + emit[:, 1:]
        take = step_score > cscore[:, 1:]
        cscore = cscore.at[:, 1:].set(jnp.where(take, step_score, cscore[:, 1:]))
        vm = vm.at[:, 1:].set(jnp.where(
            take, jnp.arange(npos - 1, dtype=jnp.int32)[None, :], vm[:, 1:]))
        # Slip
        from_score, from_pos = vslip(pscore, slip)
        from_score = from_score + emit
        take = from_score > cscore
        vm = jnp.where(take, from_pos, vm)
        cscore = jnp.where(take, from_score, cscore)

        cscore = jnp.where(pos_mask, cscore, neg)
        return cscore, vm

    pscore, vmat = jax.lax.scan(step, pscore, ltrans_t[1:])
    pscore = pscore + prior_final

    last = jnp.argmax(pscore, axis=1).astype(jnp.int32)
    score = pscore[barange, last]

    def back(pos, vm):
        prev = vm[barange, pos]
        return prev, pos

    first, rest = jax.lax.scan(back, last, vmat, reverse=True)
    path = jnp.concatenate([first[None], rest], axis=0)   # (T, B)
    return score, path.T


def remap_posterior_to_sequence(post, seq_states, slip, prior_initial=None,
                                prior_final=None):
    """Single-read convenience wrapper taking probability posteriors.

    Mirrors the reference call signature (log=False path); returns numpy.
    """
    post = np.asarray(post, dtype=np.float32)
    ltrans = np.log(post)[None]
    seq = np.asarray(seq_states, dtype=np.int32)[None]
    npos = seq.shape[1]
    p0 = (np.zeros((1, npos), np.float32) if prior_initial is None
          else np.asarray(prior_initial, np.float32)[None])
    p1 = (np.zeros((1, npos), np.float32) if prior_final is None
          else np.asarray(prior_final, np.float32)[None])
    mask = np.ones((1, npos), bool)
    score, path = map_to_sequence(ltrans, seq, np.float32(slip), p0, p1, mask)
    return float(score[0]), np.asarray(path[0])
