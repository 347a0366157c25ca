"""Host-side (numpy) decoders for kmer-transducer posteriors.

Reference oracles used for Pallas/XLA kernel parity tests and for small
CLI runs.  Semantics match /root/reference/sloika/decode.py:5-211 exactly,
including golden-value test behaviour.

State space: column 0 is the stay/blank state, columns 1..nkmer are kmers in
lexicographic order.  Transitions between kmer states are constrained by kmer
overlap: a "step" moves one base (new kmer's prefix = old kmer's suffix), a
"skip" moves two bases (penalised by ``skip_pen``), a "stay" emits blank.
"""
import numpy as np

from sloika_tpu import variables as sv

_ETA = 1e-10


def argmax(post, zero_is_blank=True):
    """Argmax decoding of a simple transducer: blank-collapse the argmax path.

    :param post: 2D posterior (time, states)
    :returns: 1D called kmer-state sequence
    """
    blank_state = 0 if zero_is_blank else post.shape[1] - 1
    path = np.argmax(post, axis=1)
    path_trimmed = path[path != blank_state]
    if zero_is_blank:
        path_trimmed = path_trimmed - 1
    return path_trimmed


def prepare_post(post, min_prob=1e-5, drop_bad=False):
    """Sanitise a posterior matrix for decoding.

    Squeezes the batch axis, optionally drops bad-state positions (argmax 0)
    with renormalisation, and floors probabilities at ``min_prob``.
    """
    post = np.squeeze(post, axis=1)
    if drop_bad:
        maxcall = np.argmax(post, axis=1)
        post = post[maxcall > 0, 1:]
        weight = np.sum(post, axis=1, keepdims=True)
        post = post / weight
    return min_prob + (1.0 - min_prob) * post


def viterbi(post, klen, skip_pen=0.0, log=False, nbase=4):
    """Viterbi decoding of a kmer transducer with stay/step/skip transitions.

    The step/skip structure exploits the lexicographic kmer indexing: kmers
    reachable by a one-base step from kmer ``k`` share ``k``'s suffix, so the
    per-state max over predecessors reduces to a reshape + max over the
    leading base(s) (reference decode.py:64-82).

    :returns: (score, best path of kmer states with stays collapsed)
    """
    nev, nst = post.shape
    assert klen >= 3, "Kmer not long enough to apply Viterbi with skips"
    nkmer = sv.nkmer(klen, nbase=nbase)
    assert sv.nstate(klen, transducer=True, nbase=nbase) == nst
    nstep = nbase
    nskip = nbase ** 2

    lpost = np.log(post + _ETA) if not log else post
    vscore = lpost[0][1:].copy()
    traceback = np.empty((nev, nkmer), dtype=np.int32)
    for i in range(1, nev):
        pscore = vscore

        # Step: best predecessor among kmers whose suffix is our prefix
        ps = pscore.reshape(nstep, -1)
        nrem = ps.shape[1]
        score_step = np.repeat(np.amax(ps, axis=0), nstep)
        from_step = np.repeat(nrem * np.argmax(ps, axis=0) + np.arange(nrem), nstep)
        # Skip: two-base move, penalised
        ps = pscore.reshape(nskip, -1)
        nrem = ps.shape[1]
        score_skip = np.repeat(np.amax(ps, axis=0), nskip) - skip_pen
        from_skip = np.repeat(nrem * np.argmax(ps, axis=0) + np.arange(nrem), nskip)

        vscore = lpost[i][1:] + np.maximum(score_step, score_skip)
        traceback[i] = np.where(score_step > score_skip, from_step, from_skip)

        # Stay: emit blank, remain in state; traceback flag -1
        score_stay = pscore + lpost[i][0]
        traceback[i] = np.where(vscore > score_stay, traceback[i], -1)
        vscore = np.maximum(vscore, score_stay)

    seq = [int(np.argmax(vscore))]
    for i in range(nev - 1, 0, -1):
        tstate = traceback[i][seq[-1]]
        if tstate >= 0:
            seq.append(int(tstate))

    return np.amax(vscore), seq[::-1]


def score(post, seq, full=False):
    """Forwards score of a sequence (alias of :func:`forwards`)."""
    return forwards(post, seq, full=full)


def forwards(post, seq, full=False):
    """Forwards (sum-product) score of mapping ``post`` onto ``seq``.

    The state space is seq position + an initial blank state; at each event
    either stay (emit blank, last column of post) or advance one position
    (emit that position's kmer state).

    :param full: require the path to end at the final position
    """
    seq = np.asarray(seq)
    seq_len = len(seq)
    fwd = np.ones(seq_len + 1)
    if full:
        fwd.fill(0.0)
        fwd[0] = 1.0
    total = 0.0
    for p in post:
        fprev = fwd
        fwd = fprev * p[-1]
        fwd[1:] += fprev[:-1] * p[seq]
        m = np.sum(fwd)
        fwd /= m
        total += np.log(m)
    return total + (np.log(fwd[-1]) if full else 0.0)


def forwards_transpose(post, seq, skip_prob=0.0):
    """Forwards score computed by iterating through the *sequence* — shows the
    forward recursion can run position-major (useful for iterative sequence
    refinement; reference decode.py:142-176)."""
    nev, _ = post.shape
    fwd = np.concatenate(([1.0], np.cumprod(post[:, -1])))
    m = np.sum(fwd)
    fwd /= m
    total = np.log(m)

    for s in seq:
        fprev = fwd
        fwd = fprev * skip_prob
        fwd[1:] += fprev[:-1] * post[:, s]
        for i in range(nev):
            fwd[i + 1] += fwd[i] * post[i, -1]
        m = np.sum(fwd)
        fwd /= m
        total += np.log(m)
    return total + np.log(fwd[-1])


def backwards_transpose(post, seq, skip_prob=0.0):
    """Backwards analogue of :func:`forwards_transpose`
    (reference decode.py:179-211)."""
    nev, _ = post.shape
    bwd = np.concatenate(([1.0], np.cumprod(post[::-1, -1])))[::-1]
    m = np.sum(bwd)
    bwd /= m
    total = np.log(m)

    for s in seq[::-1]:
        bnext = bwd
        bwd = bnext * skip_prob
        bwd[:-1] += bnext[1:] * post[:, s]
        for i in range(nev, 0, -1):
            bwd[i - 1] += bwd[i] * post[i - 1, -1]
        m = np.sum(bwd)
        bwd /= m
        total += np.log(m)
    return total + np.log(bwd[0])
