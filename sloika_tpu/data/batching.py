"""Event-domain data preparation: trimming, chunking and labelling.

Covers /root/reference/sloika/batch.py:23-124,194-220 with the same
semantics, redesigned without worker-global state: the kmer -> state mapping
is computed vectorised (:func:`kmer_array_to_states`) instead of per-event
dict lookups.
"""
import numpy as np

from sloika_tpu import maths, util
from sloika_tpu.config import sloika_dtype
from sloika_tpu.data import features as features_mod
from sloika_tpu.variables import DEFAULT_ALPHABET

TRIM_OPEN_PORE_LOCAL_VAR_METHODS = frozenset(['mad', 'std'])
DEFAULT_NORMALISATION = 'per-read'
AVAILABLE_NORMALISATIONS = frozenset(['none', 'per-read', 'per-chunk'])


def kmer_array_to_states(kmer_array, kmer_len, alphabet=DEFAULT_ALPHABET,
                         index_from=0):
    """Vectorised centre-kmer -> lexicographic state index extraction.

    Extracts the rightmost-middle ``kmer_len``-mer of each (longer) kmer in
    ``kmer_array`` and encodes it positionally (base-``nbase``), matching the
    reference's per-event dict lookup (batch.py:69-73,
    chunkify_raw.py:123-142) at numpy speed.
    """
    kmer_array = np.ascontiguousarray(kmer_array)
    if kmer_array.dtype.kind == 'U':
        # a unicode array viewed as raw bytes is UTF-32 — re-encode so the
        # byte-LUT path below sees one byte per letter
        kmer_array = kmer_array.astype('S')
    itemsize = kmer_array.dtype.itemsize
    old_len = len(kmer_array.flat[0])
    assert kmer_len <= old_len
    offset = (old_len - kmer_len + 1) // 2

    if isinstance(alphabet, str):
        alphabet = alphabet.encode('utf-8')
    lut = np.full(256, -1, dtype=np.int64)
    for i, b in enumerate(alphabet):
        lut[b] = i
    nbase = len(alphabet)

    flat = kmer_array.reshape(-1)
    a = np.frombuffer(flat.tobytes(), dtype=np.uint8).reshape(len(flat), itemsize)
    codes = lut[a[:, offset:offset + kmer_len]]
    if np.any(codes < 0):
        raise ValueError("kmer array contains letters outside alphabet")
    powers = nbase ** np.arange(kmer_len - 1, -1, -1, dtype=np.int64)
    states = (codes * powers).sum(axis=1) + index_from
    return states.reshape(kmer_array.shape).astype(np.int32)


def trim_ends_and_filter(ev, trim, min_length, chunk_len):
    """Trim events from both ends; None if the read is then too short."""
    if len(ev) < sum(trim) + chunk_len or len(ev) < min_length:
        return None
    return util.trim_array(ev, *trim)


def chunkify(ev, chunk_len, kmer_len, use_scaled, normalisation,
             alphabet=DEFAULT_ALPHABET):
    """Chunk a mapped event table into fixed windows with labels.

    :param ev: record array with mean/stdv/length(/scaled_*) features plus
        mapping fields kmer, seq_pos, good_emission
    :returns: (chunks (N, chunk_len, 4) f32, labels (N, chunk_len) i32 with
        0 = stay, bad (N, chunk_len) bool)
    """
    assert len(ev) >= chunk_len
    ml = len(ev) // chunk_len
    ub = ml * chunk_len
    tag = 'scaled_' if use_scaled else ''

    if normalisation == 'per-chunk':
        mats = []
        for ci in range(ml):
            lo = ci * chunk_len
            hi = lo + chunk_len
            # one event of padding so the delta-mean feature is defined
            hi_pad = min(hi + 1, len(ev))
            feat = features_mod.from_events(ev[lo:hi_pad], tag=tag,
                                            normalise=True)
            mats.append(feat[:chunk_len])
        new_inMat = np.concatenate(mats)
    else:
        assert normalisation in ['none', 'per-read']
        new_inMat = features_mod.from_events(ev, tag=tag,
                                             normalise=normalisation == 'per-read')
        new_inMat = new_inMat[0:ub]

    new_inMat = new_inMat.reshape((ml, chunk_len, -1))
    ev = ev[0:ub]

    new_labels = kmer_array_to_states(ev['kmer'], kmer_len, alphabet=alphabet,
                                      index_from=1)
    new_labels = new_labels.reshape(ml, chunk_len)
    change = ev['seq_pos'].reshape(ml, chunk_len)
    change = np.apply_along_axis(np.ediff1d, 1, change, to_begin=1)
    new_labels[change == 0] = 0  # stays get the blank label

    new_bad = np.logical_not(ev['good_emission']).reshape(ml, chunk_len)

    return (np.ascontiguousarray(new_inMat),
            np.ascontiguousarray(new_labels),
            np.ascontiguousarray(new_bad))


def trim_open_pore(signal, max_op_fraction=0.3, var_method='mad',
                   window_size=100, return_range=False):
    """Locate the read within a raw signal by thresholding local variance
    (open-pore segments are low-variance; batch.py:194-220).

    With ``return_range`` the (start, end) sample indices are returned
    instead of the slice (used by the DAC input path, which must slice the
    *unscaled* integer signal by the range found on the scaled one)."""
    assert var_method in TRIM_OPEN_PORE_LOCAL_VAR_METHODS, \
        "var_method not understood: {}".format(var_method)
    ml = len(signal) // window_size
    ub = ml * window_size
    if var_method == 'std':
        local_var = signal[:ub].reshape((ml, window_size)).std(1)
    else:
        local_var = maths.mad(signal[:ub].reshape((ml, window_size)), axis=1)
    probably_read = local_var > np.percentile(local_var, 100 * max_op_fraction)
    ix = np.arange(local_var.shape[0])[probably_read]
    start = ix.min() * window_size
    end = (ix.max() + 1) * window_size
    if return_range:
        return start, end
    return signal[start:end]


def normalise_raw_signal(signal):
    """Per-read (median, MAD) normalisation used for raw basecalling
    (basecall.py:117-118)."""
    return ((signal - np.median(signal)) / maths.mad(signal)).astype(sloika_dtype)
