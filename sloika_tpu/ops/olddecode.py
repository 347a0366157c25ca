"""Legacy (non-transducer) decoder with per-event transition weights.

Host-side numpy; semantics match /root/reference/sloika/olddecode.py:13-117.
Used for basecalling non-transducer event models.
"""
import itertools

import numpy as np

_ETA = 1e-10
_NSTEP = 4
_NSKIP = _NSTEP ** 2
_STEP_FACTOR = np.log(_NSTEP)
_SKIP_FACTOR = np.log(_NSKIP)


def decode_profile(post, trans=None, log=False, slip=0.0):
    """Viterbi decoding with per-event [stay, step, skip] weights and an
    optional uniform slip move.

    :param post: (time, nkmer) posteriors
    :param trans: iterable of per-event log-scaled transition weight triples
    :param log: posteriors already log-scaled
    :param slip: slip probability (uniform teleport between states)
    :returns: (score, state sequence)
    """
    nstate = post.shape[1]
    lpost = post.copy()
    if not log:
        np.add(_ETA, lpost, lpost)
        np.log(lpost, lpost)

    if trans is None:
        trans = itertools.repeat(np.zeros(3))
    else:
        trans = np.copy(trans)
        trans[:, 1] -= _STEP_FACTOR
        trans[:, 2] -= _SKIP_FACTOR

    log_slip = np.log(_ETA + slip)

    pscore = lpost[0]
    trans_iter = iter(trans)
    for ev in range(1, len(post)):
        ev_trans = next(trans_iter)
        # Stay
        score = pscore + ev_trans[0]
        iscore = np.arange(nstate)
        # Slip
        score_new = np.amax(pscore) + log_slip
        iscore_new = np.argmax(pscore)
        iscore = np.where(score > score_new, iscore, iscore_new)
        score = np.fmax(score, score_new)
        # Step
        ps = pscore.reshape((_NSTEP, -1))
        nrem = ps.shape[1]
        score_new = np.repeat(np.amax(ps, axis=0), _NSTEP) + ev_trans[1]
        iscore_new = np.repeat(nrem * np.argmax(ps, axis=0) + np.arange(nrem), _NSTEP)
        iscore = np.where(score > score_new, iscore, iscore_new)
        score = np.fmax(score, score_new)
        # Skip
        ps = pscore.reshape((_NSKIP, -1))
        nrem = ps.shape[1]
        score_new = np.repeat(np.amax(ps, axis=0), _NSKIP) + ev_trans[2]
        iscore_new = np.repeat(nrem * np.argmax(ps, axis=0) + np.arange(nrem), _NSKIP)
        iscore = np.where(score > score_new, iscore, iscore_new)
        score = np.fmax(score, score_new)
        # Store traceback in-place over consumed posterior rows
        lpost[ev - 1] = iscore
        pscore = score + lpost[ev]

    state_seq = np.zeros(len(post), dtype=int)
    state_seq[-1] = np.argmax(pscore)
    for ev in range(len(post), 1, -1):
        state_seq[ev - 2] = int(lpost[ev - 2][state_seq[ev - 1]])

    return np.amax(pscore), state_seq


def decode_transition(post, trans, log=False, slip=0.0):
    """Viterbi decoding with a single global [stay, step, skip] weight.

    (The reference passed ``itertools.repeat`` here, which its own
    ``decode_profile`` cannot consume — olddecode.py:82 is broken upstream;
    tiling the weights per event implements the documented intent.)
    """
    return decode_profile(post, trans=np.tile(np.asarray(trans), (len(post), 1)),
                          log=log, slip=slip)


def decode_simple(post, log=False, slip=0.0):
    """Viterbi decoding with uniform transitions."""
    return decode_profile(post, log=log, slip=slip)


def estimate_transitions(post, trans=None):
    """Naive per-event estimate of stay/step/skip behaviour from posteriors.

    :param trans: prior [stay, step, skip] belief; None = use global estimate
    :returns: (time, 3) row-normalised transition weights
    """
    assert trans is None or len(trans) == 3, 'Incorrect number of transitions'
    res = np.zeros((len(post), 3))
    res[:] = _ETA

    for ev in range(1, len(post)):
        stay = np.sum(post[ev - 1] * post[ev])
        p = post[ev].reshape((-1, _NSTEP))
        step = np.sum(post[ev - 1] * np.tile(np.sum(p, axis=1), _NSTEP)) / _NSTEP
        p = post[ev].reshape((-1, _NSKIP))
        skip = np.sum(post[ev - 1] * np.tile(np.sum(p, axis=1), _NSKIP)) / _NSKIP
        res[ev - 1] = [stay, step, skip]

    if trans is None:
        trans = np.sum(res, axis=0)
        trans /= np.sum(trans)

    res *= trans
    res /= np.sum(res, axis=1).reshape((-1, 1))
    return res
