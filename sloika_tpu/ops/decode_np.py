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


#: traceback code for "emitted blank, stayed in place"
_STAY = -1


def predecessor_table(nkmer, nbase, order):
    """Explicit predecessor-state table for ``order``-base kmer moves.

    ``P[j]`` lists every kmer state that can reach state ``j`` by shifting
    in ``order`` fresh bases — i.e. every kmer whose last ``klen - order``
    bases equal ``j``'s first ``klen - order`` bases.  With lexicographic
    kmer indexing (first base most significant) that set is
    ``{lead * nkmer/nbase**order + j // nbase**order}`` over all ``lead``.
    Rows are ordered by the predecessor's leading bases so a max over the
    row resolves ties to the lowest predecessor index.

    :returns: int32 array of shape ``(nkmer, nbase**order)``
    """
    width = nbase ** order
    assert nkmer % width == 0
    lead = np.arange(width, dtype=np.int64) * (nkmer // width)
    kept_prefix = np.arange(nkmer, dtype=np.int64) // width
    return (kept_prefix[:, None] + lead[None, :]).astype(np.int32)


def _best_predecessor(prev_scores, pred_table):
    """Max/argmax over each state's explicit predecessor list.

    :returns: (best score per state, best predecessor STATE INDEX per state)
    """
    gathered = prev_scores[pred_table]
    choice = np.argmax(gathered, axis=1)
    rows = np.arange(pred_table.shape[0])
    return gathered[rows, choice], pred_table[rows, choice]


def viterbi(post, klen, skip_pen=0.0, log=False, nbase=4):
    """Viterbi decoding of a kmer transducer with stay/step/skip transitions.

    Independent transcription of the reference semantics
    (decode.py:39-93) built on explicit per-state predecessor-index tables
    (:func:`predecessor_table`) rather than the reference's reshape/repeat
    vectorisation; tie-breaking is preserved exactly (a skip beats an
    equal-scoring step; a stay beats an equal-scoring move).

    :returns: (score, best path of kmer states with stays collapsed)
    """
    nev, nst = post.shape
    assert klen >= 3, "Kmer not long enough to apply Viterbi with skips"
    nkmer = sv.nkmer(klen, nbase=nbase)
    assert sv.nstate(klen, transducer=True, nbase=nbase) == nst

    step_pred = predecessor_table(nkmer, nbase, 1)
    skip_pred = predecessor_table(nkmer, nbase, 2)

    lpost = post if log else np.log(post + _ETA)
    vscore = lpost[0, 1:].copy()
    # tb[t] describes the transition taken into event t+1: a predecessor
    # kmer state, or _STAY for a blank emission
    tb = np.empty((nev - 1, nkmer), dtype=np.int32)
    for t in range(nev - 1):
        best_step, from_step = _best_predecessor(vscore, step_pred)
        best_skip, from_skip = _best_predecessor(vscore, skip_pred)
        best_skip = best_skip - skip_pen

        took_step = best_step > best_skip           # skip wins ties
        move_score = np.where(took_step, best_step, best_skip)
        move_from = np.where(took_step, from_step, from_skip)

        emit = lpost[t + 1]
        moved = emit[1:] + move_score
        stayed = emit[0] + vscore
        took_move = moved > stayed                  # stay wins ties
        tb[t] = np.where(took_move, move_from, _STAY)
        vscore = np.where(took_move, moved, stayed)

    state = int(np.argmax(vscore))
    calls = [state]
    for t in range(nev - 2, -1, -1):
        pred = int(tb[t, state])
        if pred != _STAY:
            state = pred
            calls.append(state)
    calls.reverse()
    return np.amax(vscore), calls


def score(post, seq, full=False):
    """Forwards score of a sequence (alias of :func:`forwards`)."""
    return forwards(post, seq, full=full)


def _renorm(vec, log_total):
    """Normalise a forward/backward vector in place; accumulate log mass."""
    z = np.sum(vec)
    return vec / z, log_total + np.log(z)


def forwards(post, seq, full=False):
    """Forwards (sum-product) score of mapping ``post`` onto ``seq``.

    The state space is seq position + an initial blank state; at each event
    either stay (emit blank, last column of post) or advance one position
    (emit that position's kmer state).

    :param full: require the path to end at the final position
    """
    seq = np.asarray(seq)
    npos = len(seq) + 1
    alpha = np.zeros(npos) if full else np.ones(npos)
    alpha[0] = 1.0
    log_score = 0.0
    for row in post:
        advanced = alpha * row[-1]
        advanced[1:] += alpha[:-1] * row[seq]
        alpha, log_score = _renorm(advanced, log_score)
    return log_score + (np.log(alpha[-1]) if full else 0.0)


def forwards_transpose(post, seq, skip_prob=0.0):
    """Forwards score computed by iterating through the *sequence* — shows the
    forward recursion can run position-major (useful for iterative sequence
    refinement; reference decode.py:142-176)."""
    nev = len(post)
    stay_col = post[:, -1]
    alpha, log_score = _renorm(
        np.concatenate(([1.0], np.cumprod(stay_col))), 0.0)
    for s in seq:
        nxt = alpha * skip_prob
        nxt[1:] += alpha[:-1] * post[:, s]
        for ev in range(nev):
            nxt[ev + 1] += nxt[ev] * stay_col[ev]
        alpha, log_score = _renorm(nxt, log_score)
    return log_score + np.log(alpha[-1])


def backwards_transpose(post, seq, skip_prob=0.0):
    """Backwards analogue of :func:`forwards_transpose`
    (reference decode.py:179-211)."""
    nev = len(post)
    stay_col = post[:, -1]
    beta, log_score = _renorm(
        np.concatenate(([1.0], np.cumprod(stay_col[::-1])))[::-1], 0.0)
    for s in seq[::-1]:
        nxt = beta * skip_prob
        nxt[:-1] += beta[1:] * post[:, s]
        for ev in range(nev - 1, -1, -1):
            nxt[ev] += nxt[ev + 1] * stay_col[ev]
        beta, log_score = _renorm(nxt, log_score)
    return log_score + np.log(beta[0])
