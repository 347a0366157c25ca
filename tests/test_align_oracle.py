"""Exact-DP validation of the native banded affine aligner.

The whole accuracy-evaluation subsystem (align.py, replacing the reference's
bwa mem shell-out, /root/reference/misc/align.py:46-67) rests on
``native.align_semiglobal``.  This module validates it against an exact
*unbanded* affine-gap (Gotoh) oracle implemented independently in numpy:

* score parity on random mutated queries across the 70-99% identity
  operating range (the banded DP with auto-widen must find the true
  optimum, not a band-clipped one);
* hand-computable micro cases (perfect match, single mismatch, affine gap
  pricing, free reference end gaps);
* characterisation of *band failure*: a balanced insertion+deletion pair
  displaces the optimal path off the scaled diagonal without changing the
  query/reference length ratio, so the default band silently clips the
  optimum — and the auto-widen policy (native.align_semiglobal) recovers it.
"""
import numpy as np
import pytest

from sloika_tpu import native

NEG = -(1 << 40)


def exact_semiglobal(q, r, match=2, mismatch=-2, gap_open=-4, gap_extend=-2):
    """Unbanded Gotoh DP with the native kernel's exact semantics
    (native/sloika_native.cpp:49-181): query global, reference free end
    gaps, no Ix<->Iy direct transitions, termination over M/Ix of the last
    row.

    :returns: (score, nmatch, nmismatch, nins, ndel)
    """
    if isinstance(q, str):
        q = q.encode()
    if isinstance(r, str):
        r = r.encode()
    n, m = len(q), len(r)
    M = np.full((n + 1, m + 1), NEG, np.int64)
    Ix = np.full((n + 1, m + 1), NEG, np.int64)
    Iy = np.full((n + 1, m + 1), NEG, np.int64)
    # traceback: which matrix the max came from (0=M, 1=Ix, 2=Iy)
    tbM = np.zeros((n + 1, m + 1), np.int8)
    tbX = np.zeros((n + 1, m + 1), np.int8)   # 1 = gap extension
    tbY = np.zeros((n + 1, m + 1), np.int8)
    M[0, :] = 0                               # free leading reference gap
    oe = gap_open + gap_extend
    for i in range(1, n + 1):
        qc = q[i - 1]
        for j in range(0, m + 1):
            # Ix: insertion in query (gap in ref), from (i-1, j)
            o, e = M[i - 1, j] + oe, Ix[i - 1, j] + gap_extend
            if o >= e:
                Ix[i, j] = o
            else:
                Ix[i, j], tbX[i, j] = e, 1
            if j > 0:
                # M: (mis)match from (i-1, j-1)
                s = match if qc == r[j - 1] else mismatch
                best, frm = M[i - 1, j - 1], 0
                if Ix[i - 1, j - 1] > best:
                    best, frm = Ix[i - 1, j - 1], 1
                if Iy[i - 1, j - 1] > best:
                    best, frm = Iy[i - 1, j - 1], 2
                if best > NEG // 2:
                    M[i, j], tbM[i, j] = best + s, frm
                # Iy: deletion from ref, from (i, j-1)
                o, e = M[i, j - 1] + oe, Iy[i, j - 1] + gap_extend
                if o >= e:
                    Iy[i, j] = o
                else:
                    Iy[i, j], tbY[i, j] = e, 1
    # termination: best of last row over M and Ix (free trailing ref gap)
    jM, jX = int(np.argmax(M[n])), int(np.argmax(Ix[n]))
    if M[n, jM] >= Ix[n, jX]:
        mat, j = 0, jM
    else:
        mat, j = 1, jX
    score = int(max(M[n, jM], Ix[n, jX]))
    # traceback for counts
    i, nmatch, nmis, nins, ndel = n, 0, 0, 0, 0
    while i > 0:
        if mat == 0:
            if q[i - 1] == r[j - 1]:
                nmatch += 1
            else:
                nmis += 1
            mat = int(tbM[i, j])
            i, j = i - 1, j - 1
        elif mat == 1:
            nins += 1
            mat = 1 if tbX[i, j] else 0
            i -= 1
        else:
            ndel += 1
            mat = 2 if tbY[i, j] else 0
            j -= 1
    return score, nmatch, nmis, nins, ndel


BASES = "ACGT"


def _rand_seq(rng, n):
    return "".join(BASES[b] for b in rng.integers(0, 4, n))


def _mutate(seq, rng, sub=0.0, ins=0.0, dele=0.0):
    out = []
    for c in seq:
        u = rng.random()
        if u < dele:
            pass
        elif u < dele + sub:
            out.append(BASES[(BASES.index(c) + rng.integers(1, 4)) % 4])
        else:
            out.append(c)
        if rng.random() < ins:
            out.append(BASES[rng.integers(0, 4)])
    return "".join(out)


@pytest.mark.skipif(not native.available(), reason="native library required")
class TestMicroCases:
    def test_perfect_match(self):
        aln = native.align_semiglobal("ACGTACGT", "ACGTACGT")
        assert (aln.score, aln.match, aln.mismatch) == (16, 8, 0)
        assert exact_semiglobal("ACGTACGT", "ACGTACGT")[:2] == (16, 8)

    def test_single_mismatch(self):
        aln = native.align_semiglobal("ACGTACGT", "ACGAACGT")
        assert aln.score == 7 * 2 - 2 == exact_semiglobal(
            "ACGTACGT", "ACGAACGT")[0]
        assert (aln.match, aln.mismatch) == (7, 1)

    def test_affine_gap_pricing(self):
        # deleting GG from the middle of two distinctive 10-mers: one open +
        # two extends = -4 - 2*2; any gapless alternative mismatches ~half
        # the bases, so the deletion path is the unique optimum
        x, y = "ACGTACGTAC", "TGCATGCATG"
        q, r = x + y, x + "GG" + y
        want = 20 * 2 - 4 - 2 * 2
        aln = native.align_semiglobal(q, r)
        assert aln.score == want == exact_semiglobal(q, r)[0]
        assert aln.deletion == 2

    def test_free_reference_end_gaps(self):
        # query matches an interior window: no gap penalty at either end
        r = "TTTTTTACGTACGTAAAAAA"
        q = "ACGTACGT"
        aln = native.align_semiglobal(q, r)
        assert aln.score == 16 == exact_semiglobal(q, r)[0]
        assert (aln.rstart, aln.rend) == (6, 14)


@pytest.mark.skipif(not native.available(), reason="native library required")
@pytest.mark.parametrize("identity,seed", [
    (0.99, 0), (0.95, 1), (0.90, 2), (0.85, 3), (0.80, 4), (0.70, 5),
])
def test_score_parity_random_mutations(identity, seed):
    """Across the basecall accuracy operating range, the banded aligner with
    auto-widen finds exactly the unbanded optimum."""
    rng = np.random.default_rng(seed)
    err = 1.0 - identity
    ref = _rand_seq(rng, 420)
    # query covers an interior window; errors split between subs/ins/dels
    q = _mutate(ref[40:380], rng, sub=err / 2, ins=err / 4, dele=err / 4)
    exact = exact_semiglobal(q, ref)
    aln = native.align_semiglobal(q, ref, auto_widen=True)
    assert aln is not None
    assert aln.score == exact[0], \
        "banded score {} != exact {}".format(aln.score, exact[0])
    acc_exact = exact[1] / max(sum(exact[1:]), 1)
    assert abs(aln.accuracy - acc_exact) < 0.02   # co-optimal path wiggle


@pytest.mark.skipif(not native.available(), reason="native library required")
def test_band_failure_characterised_and_recovered():
    """A 400-base junk prefix on a query that otherwise matches the start
    of the reference keeps the optimal path 400 cells below the scaled
    diagonal for the entire alignment, while qlen == rlen keeps the default
    band at max(128, L/10) = 128 (the |qlen-rlen| term cannot save it).
    The query is global, so the in-band alternative must burn the prefix on
    mismatches/gaps and loses heavily.  The default band must lose score —
    that is the failure mode — and auto-widen must recover the exact
    optimum."""
    rng = np.random.default_rng(42)
    ref = _rand_seq(rng, 1200)
    junk = _rand_seq(rng, 400)
    # optimal: open one 400-base query insertion (-804), then match
    # ref[0:800] exactly (+1600), trailing ref gap free -> 796
    q = junk + ref[:800]
    assert len(q) == len(ref)
    assert native.default_band(len(q), len(ref)) < 400

    exact = exact_semiglobal(q, ref)
    clipped = native.align_semiglobal(q, ref)               # default band
    widened = native.align_semiglobal(q, ref, auto_widen=True)

    assert clipped is None or clipped.score < exact[0], \
        "expected the default band to clip this optimum"
    assert widened is not None and widened.score == exact[0]


@pytest.mark.skipif(not native.available(), reason="native library required")
def test_auto_widen_cheap_when_band_suffices():
    """When the default band already contains the optimum, auto-widen
    returns the same score (one verification pass, no behaviour change)."""
    rng = np.random.default_rng(7)
    ref = _rand_seq(rng, 600)
    q = _mutate(ref[50:550], rng, sub=0.05, ins=0.02, dele=0.02)
    a = native.align_semiglobal(q, ref)
    b = native.align_semiglobal(q, ref, auto_widen=True)
    assert a is not None and b is not None and a.score == b.score


def test_auto_widen_cap_and_fallback_shortcircuit():
    """The widen cap tracks the documented ~1.6 GB traceback budget
    ((1<<28)//(qlen+1) half-width), and without the native library the
    (already unbanded) numpy fallback skips the widening loop."""
    from sloika_tpu import native

    # the product's own cap (native.widen_cap, used by align_semiglobal's
    # widening loop) must keep the traceback under the documented budget
    # for a 1 Mb query
    q = 1_000_000
    cap = native.widen_cap(q, q)
    assert cap * 6 * (q + 1) < 2 * (1 << 30)   # under 2 GB
    # short sequences: cap = full width (exact), never below the sequence
    assert native.widen_cap(100, 150) == 150

    # fallback short-circuit: auto_widen on tiny sequences must agree with
    # the plain call whether or not the native lib loaded
    a = native.align_semiglobal("ACGTACGTAC", "ACGTACGTAC", auto_widen=True)
    b = native.align_semiglobal("ACGTACGTAC", "ACGTACGTAC")
    assert a is not None and b is not None
    assert a.score == b.score
