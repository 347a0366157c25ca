"""Sequence remapping: Viterbi alignment of a transducer posterior against a
known sequence (host-side numpy oracle).

Semantics match /root/reference/sloika/transducer.py:14-73 plus the Cython
kernel /root/reference/sloika/viterbi_helpers.pyx:12-35.  Moves per event:
stay (emit blank), step (advance one position), and geometric slip (advance
>= 2 positions at ``slip`` penalty per base of displacement beyond one).

The slip recurrence is a running max:
    from_score[j] = max_{k <= j-2} (x[k] - slip * (j - 1 - k))
computed in O(n) — a max-plus prefix scan, which is what the batched JAX
implementation expresses with ``lax.associative_scan``.
"""
import numpy as np

from sloika_tpu.config import sloika_dtype

_STAY = 0


def slip_update(x, slip):
    """Score and provenance of the best geometric slip into each position.

    :param x: 1D score vector (previous event scores per position)
    :param slip: slip penalty (log-space, non-negative)
    :returns: (from_score, from_pos) — best slip score into each position and
        the position it came from.  Positions 0 and 1 are unreachable (-1e38).
    """
    n = len(x)
    from_score = np.zeros(n, dtype=sloika_dtype)
    from_pos = np.zeros(n, dtype=np.int64)

    from_score[0] = from_score[1] = -1e38
    if n > 2:
        from_score[2] = x[0] - slip
        from_pos[2] = 0
    for j in range(3, n):
        if from_score[j - 1] >= x[j - 2]:
            from_pos[j] = from_pos[j - 1]
            from_score[j] = from_score[j - 1]
        else:
            from_pos[j] = j - 2
            from_score[j] = x[j - 2]
        from_score[j] -= slip
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
    ltrans = trans if log else np.log(trans)

    vmat = np.zeros((nev, npos), dtype=np.int32)
    pscore = np.zeros(npos, dtype=sloika_dtype)

    if prior_initial is not None:
        pscore = pscore + prior_initial.astype(sloika_dtype)
    pscore = pscore + np.fmax(ltrans[0][sequence], ltrans[0][_STAY])

    for i in range(1, nev):
        ctrans = ltrans[i]
        # Stay
        vmat[i] = np.arange(0, npos)
        cscore = pscore + ctrans[_STAY]
        # Step
        step_score = pscore[:-1] + ctrans[sequence[1:]]
        move = np.where(step_score > cscore[1:])[0]
        cscore[move + 1] = step_score[move]
        vmat[i][move + 1] = move
        # Slip
        if slip is not None:
            from_score, from_pos = slip_update(pscore, np.float32(slip))
            from_score = from_score + ctrans[sequence]
            vmat[i] = np.where(from_score <= cscore, vmat[i], from_pos)
            cscore = np.where(from_score <= cscore, cscore, from_score)
        pscore = cscore

    if prior_final is not None:
        pscore = pscore + prior_final

    path = np.empty(nev, dtype=np.int32)
    path[0] = np.argmax(pscore)
    max_score = pscore[path[0]]
    for i in range(1, nev):
        path[i] = vmat[nev - i][path[i - 1]]

    return max_score, path[::-1]
