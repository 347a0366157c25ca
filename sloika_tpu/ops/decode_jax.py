"""Device-side (XLA) kmer-transducer Viterbi decoding.

A jittable, batched re-expression of the reference decoder
(/root/reference/sloika/decode.py:39-93).  The forward DP runs as a
``lax.scan`` over time; the step/skip maxima use the same
reshape-over-leading-bases factorisation as the reference (states reachable
by an n-base move from state s share s's suffix), which XLA lowers to cheap
reshaped reductions on the VPU.  Traceback is a second (reverse) scan over
the stored int32 traceback tensor.

Shapes are static: inputs are padded to a common length with one-hot *stay*
posteriors, which are exactly neutral (a stay neither moves the path nor
reorders scores).  Use :func:`stay_pad` to build such padding.

Outputs are fixed-size: the full state path plus a move mask; collapse to the
reference's variable-length call with :func:`collapse_path` (host-side).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sloika_tpu import variables as sv

_ETA = 1e-10


def prepare_post(post, min_prob=1e-5):
    """Floor probabilities: ``min_prob + (1 - min_prob) * post`` (jittable;
    the reference's data-dependent ``drop_bad`` variant is host-side only,
    see decode_np.prepare_post)."""
    return min_prob + (1.0 - min_prob) * post


@partial(jax.jit, static_argnames=("klen", "nbase", "log", "time_major"))
def viterbi(post, klen, skip_pen=0.0, log=False, nbase=4, time_major=False):
    """Batched Viterbi decode.

    :param post: (batch, time, nstate) posteriors — or, with ``time_major``,
        (time, batch, nstate), the model forward's native layout (the scan
        consumes time-major, so this skips the transpose round-trip) —
        nstate = nbase**klen + 1, column 0 = stay
    :param skip_pen: penalty (log-space) for two-base skips
    :returns: (score (B,), path (B, T) int32 state at each step,
        moved (B, T) bool — True where the path changed state)
    """
    assert klen >= 3, "Kmer not long enough to apply Viterbi with skips"
    if time_major:
        T, B, nst = post.shape
    else:
        B, T, nst = post.shape
    K = sv.nkmer(klen, nbase=nbase)
    assert sv.nstate(klen, transducer=True, nbase=nbase) == nst
    nstep, nskip = nbase, nbase * nbase

    lpost = jnp.log(post + _ETA) if not log else post
    if not time_major:
        lpost = jnp.moveaxis(lpost, 1, 0)  # (T, B, nstate) for the scan

    def move_scores(pscore, n):
        """Best n-base-move predecessor score and index for every state."""
        nrem = K // n
        ps = pscore.reshape(B, n, nrem)
        mx = jnp.max(ps, axis=1)
        am = jnp.argmax(ps, axis=1).astype(jnp.int32)
        score = jnp.repeat(mx, n, axis=1)
        frm = jnp.repeat(am * nrem + jnp.arange(nrem, dtype=jnp.int32)[None, :],
                         n, axis=1)
        return score, frm

    def fwd_step(vscore, lp):
        score_step, from_step = move_scores(vscore, nstep)
        score_skip, from_skip = move_scores(vscore, nskip)
        score_skip = score_skip - skip_pen

        new = lp[:, 1:] + jnp.maximum(score_step, score_skip)
        tb = jnp.where(score_step > score_skip, from_step, from_skip)

        score_stay = vscore + lp[:, 0:1]
        tb = jnp.where(new > score_stay, tb, jnp.int32(-1))
        new = jnp.maximum(new, score_stay)
        return new, tb

    v0 = lpost[0][:, 1:]
    vfinal, traceback = jax.lax.scan(fwd_step, v0, lpost[1:])
    # traceback: (T-1, B, K) for steps 1..T-1

    score = jnp.max(vfinal, axis=1)
    last_state = jnp.argmax(vfinal, axis=1).astype(jnp.int32)

    def back_step(state, tb):
        prev = tb[jnp.arange(B), state]
        moved = prev >= 0
        new_state = jnp.where(moved, prev, state)
        return new_state, (state, moved)

    first_state, (states, moved) = jax.lax.scan(
        back_step, last_state, traceback, reverse=True)
    # states[i] = state at time i+1;  moved[i] = transition into time i+1
    path = jnp.concatenate([first_state[None], states], axis=0)     # (T, B)
    moved = jnp.concatenate([jnp.zeros((1, B), bool), moved], axis=0)
    return score, path.T, moved.T


def collapse_path(path, moved, nev=None):
    """Collapse a full state path to the reference's called sequence:
    the initial state followed by every state entered by a move.

    :param path: (T,) states;  :param moved: (T,) move mask
    :param nev: restrict to the first ``nev`` events (un-padded length)
    """
    path = np.asarray(path)
    moved = np.asarray(moved).astype(bool)
    if nev is not None:
        path, moved = path[:nev], moved[:nev]
    if len(path) == 0:
        # a read with zero post-stride frames yields an empty call, not an
        # IndexError that aborts the whole batch
        return path
    keep = moved.copy()
    keep[0] = True
    return path[keep]


def stay_pad(post, target_len):
    """Pad (time, nstate) posteriors to ``target_len`` with one-hot stays."""
    T, nst = post.shape
    assert T <= target_len, \
        "stay_pad pads, it does not crop ({} > {})".format(T, target_len)
    if T == target_len:
        return post
    pad = np.zeros((target_len - T, nst), dtype=post.dtype)
    pad[:, 0] = 1.0
    return np.concatenate([post, pad], axis=0)


@partial(jax.jit, static_argnames=("zero_is_blank",))
def argmax_path(post, zero_is_blank=True):
    """Device-side argmax path + blank mask (batched).

    :param post: (batch, time, nstate)
    :returns: (path (B,T) int32, emit (B,T) bool) — collapse host-side
    """
    blank = 0 if zero_is_blank else post.shape[-1] - 1
    path = jnp.argmax(post, axis=-1).astype(jnp.int32)
    emit = path != blank
    if zero_is_blank:
        path = path - 1
    return path, emit
