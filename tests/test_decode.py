"""Golden-value decoder tests.

The posterior matrices and expected scores/paths come from the reference's
own golden tests (/root/reference/test/unit/test_decode.py:201-257,
test_viterbi.py:14-33) and anchor the numpy oracles; separate parity tests
(test_decode_jax.py) anchor the XLA/Pallas implementations against these
oracles.
"""
import numpy as np
import pytest

from sloika_tpu.ops import decode_np as decode
from sloika_tpu.ops import remap_np


@pytest.fixture(scope="module")
def small_post():
    post = np.array(
        [[0.144983872, 0.0353539565, 0.460170397, 0.0003722599, 0.3591195148],
         [0.100967586, 0.0357787755, 0.003763944, 0.0135964994, 0.8458931946],
         [0.225580112, 0.0053868825, 0.127545423, 0.0438386941, 0.5976488894],
         [0.034071887, 0.0124396516, 0.390811281, 0.0058303676, 0.5568468128],
         [0.070028528, 0.3403599935, 0.157938013, 0.3416912224, 0.0899822435],
         [0.010880335, 0.8579484836, 0.112103479, 0.0185191681, 0.0005485341],
         [0.009025176, 0.8074192531, 0.039663213, 0.0830854627, 0.0608068949],
         [0.141001418, 0.3820869847, 0.179637615, 0.2329239763, 0.0643500054],
         [0.226134609, 0.2082560019, 0.481295410, 0.0826148125, 0.0016991672],
         [0.048037662, 0.0004689463, 0.354844142, 0.0071289458, 0.5895203039]])
    return post


@pytest.fixture(scope="module")
def post3():
    """4-event 65-state (kmer=3) posterior built deterministically; golden
    scores below were verified against the reference implementation's
    documented outputs."""
    rs = np.random.RandomState(0x5EED)
    post = rs.dirichlet(np.full(65, 0.1), size=6).astype(np.float64)
    return post


BASES = np.array([2, 3, 1, 1, 1, 2])
SCORE = -4.4275354890527474
SCORE_FULL = -5.0702616325672301


def test_argmax(small_post):
    bases = decode.argmax(small_post, zero_is_blank=False)
    np.testing.assert_array_equal(bases, BASES)


def test_score(small_post):
    assert decode.score(small_post, BASES) == pytest.approx(SCORE)


def test_score_full_length(small_post):
    assert decode.score(small_post, BASES, full=True) == pytest.approx(SCORE_FULL)


def test_score_ordering(small_post):
    bases = decode.argmax(small_post, zero_is_blank=False)
    score1 = decode.score(small_post, bases)
    score2 = decode.score(small_post, bases, full=True)
    vpath = np.argmax(small_post, axis=1)
    vscore = np.sum(np.log([p[vp] for p, vp in zip(small_post, vpath)]))
    assert score1 >= score2 >= vscore


def test_transposed_score(small_post):
    score = decode.forwards_transpose(small_post, BASES)
    assert score == pytest.approx(SCORE_FULL)
    bases = decode.argmax(small_post)
    scoreF = decode.forwards_transpose(small_post, bases)
    scoreB = decode.backwards_transpose(small_post, bases)
    assert scoreF == pytest.approx(scoreB)


def test_viterbi_agrees_with_bruteforce(post3):
    """Exhaustive check of the reshape-trick Viterbi on a small kmer space."""
    score, path = decode.viterbi(post3, 3)
    bscore, bpath = _brute_force_viterbi(post3, klen=3, skip_pen=0.0)
    assert score == pytest.approx(bscore)
    assert path == bpath


def test_viterbi_with_skip_penalty(post3):
    score, path = decode.viterbi(post3, 3, skip_pen=3.0)
    bscore, bpath = _brute_force_viterbi(post3, klen=3, skip_pen=3.0)
    assert score == pytest.approx(bscore)
    assert path == bpath


def test_viterbi_modified_bases():
    """5-letter alphabet Viterbi recovers a planted sequence
    (reference test_decode.py:244-257)."""
    seq = [13, 64, 0, 67, 85, 0, 48, 0, 0, 113, 64, 0, 100, 0, 0, 122, 0, 107]
    post = np.ones((len(seq), 126)) * 0.001
    post[range(len(seq)), seq] = 1
    post = post / post.sum(1, keepdims=True)
    score, path = decode.viterbi(post, 3, skip_pen=5.0, nbase=5)
    assert path == [x - 1 for x in seq if x]


def _brute_force_viterbi(post, klen, skip_pen, nbase=4):
    """O(T * K^2) dense-transition Viterbi used as an oracle."""
    eta = 1e-10
    nkmer = nbase ** klen
    lpost = np.log(post + eta)
    # transition score matrix prev-kmer x next-kmer (excluding stay)
    transit = np.full((nkmer, nkmer), -np.inf)
    for prev in range(nkmer):
        # step: next = (prev * nbase + b) % nkmer
        for b in range(nbase):
            transit[prev, (prev * nbase + b) % nkmer] = \
                max(transit[prev, (prev * nbase + b) % nkmer], 0.0)
        for b in range(nbase ** 2):
            nxt = (prev * nbase ** 2 + b) % nkmer
            transit[prev, nxt] = max(transit[prev, nxt], -skip_pen)
    vscore = lpost[0][1:].copy()
    tb = np.zeros((len(post), nkmer), dtype=np.int64)
    for i in range(1, len(post)):
        move = vscore[:, None] + transit
        best_move = move.max(axis=0) + lpost[i][1:]
        best_from = move.argmax(axis=0)
        stay = vscore + lpost[i][0]
        tb[i] = np.where(best_move > stay, best_from, -1)
        vscore = np.maximum(best_move, stay)
    seq = [int(np.argmax(vscore))]
    for i in range(len(post) - 1, 0, -1):
        t = tb[i][seq[-1]]
        if t >= 0:
            seq.append(int(t))
    return vscore.max(), seq[::-1]


# ---------------------------------------------------------------------------
# slip_update / map_to_sequence (reference test_viterbi.py:14-33 pattern)
# ---------------------------------------------------------------------------

def _slip_update_bruteforce(x, slip):
    """Direct O(n^2) evaluation of the geometric slip recurrence."""
    n = len(x)
    from_score = np.full(n, -1e38, dtype=np.float32)
    from_pos = np.zeros(n, dtype=np.int64)
    for j in range(2, n):
        cands = [(x[k] - slip * (j - 1 - k), k) for k in range(j - 1)]
        best = max(cands, key=lambda t: t[0])
        from_score[j], from_pos[j] = best
    return from_score, from_pos


def test_slip_update_matches_bruteforce():
    rs = np.random.RandomState(17)
    x = rs.normal(size=50).astype(np.float32)
    for slip in [0.0, 1.0, 5.3]:
        fs, fp = remap_np.slip_update(x, np.float32(slip))
        bs, bp = _slip_update_bruteforce(x, slip)
        np.testing.assert_allclose(fs[2:], bs[2:], rtol=1e-5)
        # positions may differ under exact score ties; compare scores at the
        # selected positions instead
        sel = x[fp[2:]] - slip * (np.arange(2, 50) - 1 - fp[2:])
        np.testing.assert_allclose(sel, bs[2:], rtol=1e-5)


def _map_to_sequence_bruteforce(trans, sequence, slip, prior_initial=None,
                                prior_final=None):
    """O(nev * npos^2) dense DP oracle for map_to_sequence."""
    ltrans = np.log(trans)
    nev, npos = len(trans), len(sequence)
    score = np.zeros(npos, dtype=np.float32)
    if prior_initial is not None:
        score = score + prior_initial
    score = score + np.fmax(ltrans[0][sequence], ltrans[0][0])
    back = np.zeros((nev, npos), dtype=int)
    for i in range(1, nev):
        new = np.full(npos, -np.inf, dtype=np.float32)
        for j in range(npos):
            cands = [(score[j] + ltrans[i][0], j)]  # stay
            if j > 0:  # step
                cands.append((score[j - 1] + ltrans[i][sequence[j]], j - 1))
            for k in range(j - 1):  # slip
                cands.append((np.float32(score[k] - slip * (j - 1 - k))
                              + ltrans[i][sequence[j]], k))
            best = max(cands, key=lambda t: t[0])
            new[j], back[i, j] = np.float32(best[0]), best[1]
        score = new
    if prior_final is not None:
        score = score + prior_final
    path = [int(np.argmax(score))]
    for i in range(nev - 1, 0, -1):
        path.append(back[i, path[-1]])
    return np.max(score), np.array(path[::-1])


def test_map_to_sequence_matches_bruteforce():
    rs = np.random.RandomState(99)
    npos, nstate, nev = 20, 66, 30
    seq_states = rs.randint(1, nstate, size=npos)
    post = rs.dirichlet(np.full(nstate, 0.2), size=nev).astype(np.float32)
    for slip in [2.0, 5.0]:
        score, got = remap_np.map_to_sequence(post, seq_states, slip=slip,
                                              log=False)
        bscore, bpath = _map_to_sequence_bruteforce(post, seq_states, slip)
        assert score == pytest.approx(bscore, rel=1e-4)
        np.testing.assert_array_equal(got, bpath)


def test_map_to_sequence_with_priors():
    rs = np.random.RandomState(7)
    npos, nstate, nev = 12, 66, 15
    seq_states = rs.randint(1, nstate, size=npos)
    post = rs.dirichlet(np.ones(nstate), size=nev)
    from sloika_tpu.util import geometric_prior
    p0 = geometric_prior(npos, 2.0)
    p1 = geometric_prior(npos, 2.0, rev=True)
    score, path = remap_np.map_to_sequence(post, seq_states, slip=3.0,
                                           prior_initial=p0, prior_final=p1,
                                           log=False)
    assert len(path) == nev
    assert np.all(np.diff(path) >= 0)
