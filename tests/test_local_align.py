"""Exact local (Smith-Waterman affine) aligner tests: brute-force per-cell
parity, agreement with the semiglobal evaluator on full-coverage calls,
and soft-clip behaviour on garbage-flanked calls (the bwa-semantics
comparison, VERDICT r3 missing #2)."""
import numpy as np
import pytest

from sloika_tpu import align


def brute_local(q, r, match=2, mismatch=-2, go=-4, ge=-2):
    """Per-cell reference DP (same grammar: no Ix<->Iy transitions)."""
    if isinstance(q, str):
        q = q.encode()
    if isinstance(r, str):
        r = r.encode()
    n, m = len(q), len(r)
    NEG = -(1 << 29)
    M = np.full((n + 1, m + 1), NEG, np.int64)
    X = np.full((n + 1, m + 1), NEG, np.int64)
    Y = np.full((n + 1, m + 1), NEG, np.int64)
    best = 0
    for i in range(1, n + 1):
        for j in range(m + 1):
            X[i, j] = max(M[i - 1, j] + go + ge, X[i - 1, j] + ge)
            if j > 0:
                s = match if q[i - 1] == r[j - 1] else mismatch
                M[i, j] = s + max(0, M[i - 1, j - 1], X[i - 1, j - 1],
                                  Y[i - 1, j - 1])
                Y[i, j] = max(M[i, j - 1] + go + ge, Y[i, j - 1] + ge)
                best = max(best, M[i, j])
    return best


@pytest.mark.parametrize("seed", range(6))
def test_score_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    q = bytes(rng.choice([65, 67, 71, 84], size=rng.randint(5, 60))
              .astype(np.uint8))
    r = bytes(rng.choice([65, 67, 71, 84], size=rng.randint(5, 60))
              .astype(np.uint8))
    res = align.local_alignment_counts(q, r)
    expect = brute_local(q, r)
    got = 0 if res is None else res[0]
    assert got == expect
    if res is not None:
        score, nm, nx, ni, nd = res[:5]
        # the traceback's counted columns reconstruct the alignment spans
        assert res[6] - res[5] == nm + nx + ni      # query span
        assert res[8] - res[7] == nm + nx + nd      # reference span


def test_perfect_and_mutated_full_coverage_agree_with_semiglobal():
    """On a high-identity full-length call, clipping never pays: local and
    semiglobal counts coincide."""
    rng = np.random.RandomState(3)
    ref = bytes(rng.choice([65, 67, 71, 84], size=400).astype(np.uint8))
    # 95% identity copy
    q = bytearray(ref)
    for i in rng.choice(len(q), size=20, replace=False):
        q[i] = rng.choice([b for b in b"ACGT" if b != q[i]])
    q = bytes(q)
    loc = align.local_accuracy_metrics("q", q, "r", ref)
    sem = align.accuracy_metrics("q", q, "r", ref)
    assert loc is not None and sem is not None
    assert loc["match"] == sem["match"]
    assert loc["mismatch"] == sem["mismatch"]
    assert loc["accuracy"] == pytest.approx(sem["accuracy"], abs=1e-9)


def test_local_soft_clips_garbage_flanks():
    """A call with garbage ends: local alignment clips them (bwa
    behaviour) so its accuracy is HIGHER than the semiglobal evaluator's,
    which charges the flanks as errors — the metric-definition delta."""
    rng = np.random.RandomState(5)
    core = bytes(rng.choice([65, 67, 71, 84], size=300).astype(np.uint8))
    flank = bytes(rng.choice([65, 67, 71, 84], size=80).astype(np.uint8))
    ref = core
    q = flank + core + flank[::-1]
    loc = align.local_accuracy_metrics("q", q, "r", ref)
    sem = align.accuracy_metrics("q", q, "r", ref, min_coverage=0.0)
    assert loc["accuracy"] > 0.98        # clipped to the clean core
    assert loc["coverage"] < 0.8         # flanks soft-clipped
    assert sem is None or sem["accuracy"] < loc["accuracy"]


def test_reverse_strand_found():
    from sloika_tpu import bio
    rng = np.random.RandomState(7)
    ref = bytes(rng.choice([65, 67, 71, 84], size=200).astype(np.uint8))
    q = bio.reverse_complement(ref.decode()).encode()
    loc = align.local_accuracy_metrics("q", q, "r", ref)
    assert loc["strand"] == "-"
    assert loc["accuracy"] == 1.0
