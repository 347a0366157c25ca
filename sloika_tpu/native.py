"""ctypes bindings for the native C++ kernels (native/sloika_native.cpp).

Provides :func:`slip_update` (C++ twin of the reference Cython kernel,
viterbi_helpers.pyx:12-35) and :func:`align_semiglobal` (banded affine
aligner used by the evaluation subsystem in place of the reference's bwa
shell-out).  The library is built on demand with g++; numpy fallbacks keep
everything functional without a toolchain.
"""
import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "native", "sloika_native.cpp")
_LIB = os.path.join(_HERE, "native", "libsloika_native.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (os.path.exists(_SRC) and
                                    os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        try:
            _build()
        except Exception as e:
            sys.stderr.write("sloika_tpu.native: build failed ({}); using "
                             "numpy fallbacks\n".format(e))
            _lib = False
            return _lib
    lib = ctypes.CDLL(_LIB)
    lib.slip_update.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
    lib.align_semiglobal.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
    lib.align_semiglobal.restype = ctypes.c_int
    _lib = lib
    return _lib


def available():
    return bool(_load())


def slip_update(x, slip):
    """Geometric-slip DP scores; see remap_np.slip_update for semantics."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    n = len(x)
    if not lib:
        from sloika_tpu.ops.remap_np import slip_update as np_slip
        return np_slip(x, np.float32(slip))
    from_score = np.zeros(n, dtype=np.float32)
    from_pos = np.zeros(n, dtype=np.int64)
    lib.slip_update(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(slip),
        from_score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        from_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return from_score, from_pos


class Alignment(object):
    """Result of a semi-global alignment."""

    __slots__ = ("score", "match", "mismatch", "insertion", "deletion",
                 "qstart", "qend", "rstart", "rend")

    def __init__(self, out):
        (self.score, self.match, self.mismatch, self.insertion,
         self.deletion, self.qstart, self.qend, self.rstart,
         self.rend) = (int(v) for v in out)

    @property
    def alnlen(self):
        return self.match + self.mismatch + self.insertion + self.deletion

    @property
    def accuracy(self):
        return self.match / max(self.alnlen, 1)

    @property
    def identity(self):
        return self.match / max(self.match + self.mismatch, 1)


def default_band(qlen, rlen):
    """Default band half-width — mirrors the native kernel's internal
    default (native/sloika_native.cpp:64-67)."""
    return max(128, max(qlen, rlen) // 10 + abs(qlen - rlen))


def widen_cap(qlen, rlen):
    """Half-width cap for the auto-widen verification loop: full-width
    (= provably exact) bounded so the native traceback
    (3 bytes x (qlen+1) x (2b+1) ~ 6b(qlen+1)) stays under ~1.6 GB for
    very long reads."""
    return min(max(qlen, rlen), max(256, (1 << 28) // (qlen + 1)))


def align_semiglobal(query, ref, match=2, mismatch=-2, gap_open=-4,
                     gap_extend=-2, band=None, auto_widen=False):
    """Banded affine-gap alignment; the query aligns globally, the reference
    has free end gaps.  Returns :class:`Alignment` or None on failure.

    Band-failure policy (``auto_widen=True``, used by the accuracy
    evaluator): a band centred on the length-scaled diagonal can clip the
    true optimum when the alignment wanders — a long indel or a junk
    prefix/suffix shifts the path off-diagonal and silently deflates the
    reported score/accuracy (characterised in tests/test_align_oracle.py).
    Since the banded DP cannot detect this itself, the result is *verified*
    by re-aligning at doubled widths until the score has been stable across
    TWO consecutive doublings (a single agreement is not evidence: two
    narrow bands can clip the same displaced optimum and coincide on an
    unrelated in-band path, tests/test_align_oracle.py band-failure case).
    The width is capped at the full matrix (= exact, unbanded) or at the
    width whose traceback fits in ~1.6 GB, whichever is smaller; a result
    that is still unstable at the cap is returned best-effort.  Typical
    cost on a well-behaved basecall is two extra (cheap, still-banded)
    alignments.
    """
    if isinstance(query, str):
        query = query.encode("ascii")
    if isinstance(ref, str):
        ref = ref.encode("ascii")
    aln = _align_banded(query, ref, match, mismatch, gap_open, gap_extend,
                        band if band else 0)
    if not auto_widen:
        return aln
    if not _load():
        # the numpy fallback is already unbanded (exact in its linear-gap
        # model) — re-running it at "wider bands" would recompute the
        # identical DP and verify nothing
        return aln
    b = band if band else default_band(len(query), len(ref))
    # When even the initial band exceeds the cap (multi-Mb queries) no
    # wider verification pass is possible — the exact DP would not fit
    # either — and the banded result is returned as-is.
    cap = widen_cap(len(query), len(ref))
    stable = 0
    while b < cap and stable < 2:
        b = min(2 * b, cap)
        wider = _align_banded(query, ref, match, mismatch, gap_open,
                              gap_extend, b)
        same = (wider is None and aln is None) or (
            wider is not None and aln is not None
            and wider.score == aln.score)
        stable = stable + 1 if same else 0
        aln = wider
    return aln


def _align_banded(query, ref, match, mismatch, gap_open, gap_extend, band):
    lib = _load()
    if not lib:
        return _align_numpy(query, ref, match, mismatch, gap_open, gap_extend)
    out = (ctypes.c_int64 * 9)()
    rc = lib.align_semiglobal(query, len(query), ref, len(ref),
                              match, mismatch, gap_open, gap_extend,
                              band, out)
    if rc != 0:
        return None
    return Alignment(list(out))


def _align_numpy(query, ref, match, mismatch, gap_open, gap_extend):
    """Slow numpy fallback when the native library cannot be built.

    LINEAR-gap (gap_open+gap_extend per base) rather than the native
    kernel's affine gaps, so scores and indel counts differ slightly from
    the native path; intended only for tiny parity tests and capped in
    size — the O(n*m) Python-loop DP would take hours on real reads.
    """
    q = np.frombuffer(query, dtype=np.uint8)
    r = np.frombuffer(ref, dtype=np.uint8)
    n, m = len(q), len(r)
    if n * m > 4 << 20:
        raise RuntimeError(
            "native aligner unavailable and sequences too large ({} x {}) "
            "for the numpy fallback — build it with `make native`"
            .format(n, m))
    gap = gap_open + gap_extend
    score = np.zeros((n + 1, m + 1), dtype=np.int32)
    ptr = np.zeros((n + 1, m + 1), dtype=np.uint8)
    score[1:, 0] = np.arange(1, n + 1) * gap
    ptr[1:, 0] = 2
    for i in range(1, n + 1):
        sub = score[i - 1, :-1] + np.where(r == q[i - 1], match, mismatch)
        up = score[i - 1, 1:] + gap
        best = np.maximum(sub, up)
        p = np.where(sub >= up, 1, 2)
        # left moves need a sequential pass
        row = score[i]
        row[1:] = best
        for j in range(1, m + 1):
            left = row[j - 1] + gap
            if left > row[j]:
                row[j] = left
                p[j - 1] = 3
        ptr[i, 1:] = p
    j = int(np.argmax(score[n]))
    i = n
    out = [int(score[n, j]), 0, 0, 0, 0, 0, n, 0, j]
    while i > 0:
        op = ptr[i, j]
        if op == 1:
            out[1 if q[i - 1] == r[j - 1] else 2] += 1
            i, j = i - 1, j - 1
        elif op == 2:
            out[3] += 1
            i -= 1
        else:
            out[4] += 1
            j -= 1
    out[7] = j
    return Alignment(out)
