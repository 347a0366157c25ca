"""Sequence remapping: Viterbi alignment of a transducer posterior against a
known sequence (host-side numpy oracle).

Behavioural contract (what the reference computes —
/root/reference/sloika/transducer.py:14-73 and
/root/reference/sloika/viterbi_helpers.pyx:12-35): given per-event state
log-posteriors and a known sequence of emission states, find the
highest-scoring monotone alignment where each event either *stays* at its
position (emitting blank), *steps* one position forward (emitting the new
position's state), or *slips* forward by d >= 2 positions (emitting the new
state, at a penalty of ``slip`` per base of displacement beyond one).
Tie-breaking: stay beats step beats slip at equal score; an earlier slip
origin beats a later one at equal score.

The implementation here is deliberately NOT the reference's: where the
reference carries a single rolling score vector with a branchy O(n)
running-max slip kernel, this oracle materialises the full
``(events, positions)`` dynamic-programming table with per-cell *move-type*
provenance, and expresses the geometric slip as a closed-form prefix
maximum — with ``y[k] = x[k] + slip * k``,

    best slip into j  =  max_{k <= j-2} y[k]  -  slip * (j - 1),

a single ``np.maximum.accumulate`` (the same algebra the batched XLA
implementation uses via ``lax.associative_scan``, so the two agree to f32
rounding).  A brute-force path enumerator for small instances lives in
tests/test_decode.py as a second, independent check.
"""
import numpy as np

_STAY = 0

#: provenance codes stored per DP cell
MOVE_STAY, MOVE_STEP, MOVE_SLIP = np.int8(0), np.int8(1), np.int8(2)


def slip_update(x, slip):
    """Score and provenance of the best geometric slip into each position.

    :param x: 1D score vector (previous event scores per position)
    :param slip: slip penalty (log-space, non-negative)
    :returns: (from_score, from_pos) — best ``x[k] - slip * (j-1-k)`` over
        ``k <= j - 2`` for each position j, and the k it came from.
        Positions 0 and 1 are unreachable (-1e38).  Equal-scoring origins
        resolve to the earliest k.
    """
    x = np.asarray(x, dtype=np.float64)     # oracle precision: f64 internal
    n = len(x)
    from_score = np.full(n, -1e38, dtype=np.float64)
    from_pos = np.zeros(n, dtype=np.int64)
    if n <= 2:
        return from_score, from_pos

    idx = np.arange(n, dtype=np.float64)
    y = x + np.float64(slip) * idx
    run_max = np.maximum.accumulate(y)
    # first-occurrence prefix argmax: a position is a new champion only when
    # it strictly beats everything before it (ties keep the earlier origin)
    prev_max = np.concatenate(([-np.inf], run_max[:-1]))
    champion = np.where(y > prev_max, np.arange(n), 0)
    run_arg = np.maximum.accumulate(champion)

    from_score[2:] = run_max[:-2] - np.float64(slip) * (idx[2:] - 1.0)
    from_pos[2:] = run_arg[:-2]
    return from_score, from_pos


def map_to_sequence(trans, sequence, slip=None, prior_initial=None,
                    prior_final=None, log=True):
    """Viterbi path of a transducer posterior through a known sequence.

    :param trans: (events, states) transducer posterior
    :param sequence: 1D kmer-state sequence to map against (state indices
        *including* the +1 blank offset)
    :param slip: slip penalty (log-space, >= 0) or None to disallow slips
    :param prior_initial: log-prior over the initial sequence position
    :param prior_final: log-prior over the final sequence position
    :param log: ``trans`` is already log-scaled
    :returns: (score, path of sequence positions, one per event)
    """
    assert slip is None or slip >= 0.0, 'Slip penalty should be non-negative'
    sequence = np.asarray(sequence)
    nev = len(trans)
    npos = len(sequence)
    ltrans = np.asarray(trans, dtype=np.float64)
    if not log:
        ltrans = np.log(ltrans)

    # full DP table + provenance: score[i, j] = best score of an alignment
    # of events 0..i whose event i sits at sequence position j.  Scores are
    # f64 throughout — this is the precision reference for the f32 device
    # kernels, so it should carry as little rounding of its own as possible.
    score = np.empty((nev, npos), dtype=np.float64)
    move = np.zeros((nev, npos), dtype=np.int8)
    slip_from = np.zeros((nev, npos), dtype=np.int64)

    emit = ltrans[:, sequence]                    # (events, positions)
    first = np.fmax(emit[0], ltrans[0, _STAY])
    if prior_initial is not None:
        first = first + np.asarray(prior_initial, dtype=np.float64)
    score[0] = first

    neg_inf = np.float64(-np.inf)
    for i in range(1, nev):
        prev = score[i - 1]
        best = prev + ltrans[i, _STAY]            # stay candidate, all j

        stepped = np.empty(npos, dtype=np.float64)
        stepped[0] = neg_inf
        stepped[1:] = prev[:-1] + emit[i, 1:]
        is_step = stepped > best                  # strict: stay wins ties
        move[i] = np.where(is_step, MOVE_STEP, MOVE_STAY)
        best = np.where(is_step, stepped, best)

        if slip is not None:
            sl_score, sl_pos = slip_update(prev, np.float32(slip))
            slipped = sl_score + emit[i]
            is_slip = slipped > best              # strict: slip loses ties
            move[i] = np.where(is_slip, MOVE_SLIP, move[i])
            slip_from[i] = sl_pos
            best = np.where(is_slip, slipped, best)
        score[i] = best

    final = score[-1]
    if prior_final is not None:
        final = final + prior_final

    path = np.empty(nev, dtype=np.int32)
    path[-1] = np.argmax(final)
    for i in range(nev - 1, 0, -1):
        j = path[i]
        m = move[i, j]
        path[i - 1] = (j if m == MOVE_STAY
                       else j - 1 if m == MOVE_STEP
                       else slip_from[i, j])
    return final[path[-1]], path
