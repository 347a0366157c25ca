"""Sequence and kmer algebra.

Covers the API surface of /root/reference/sloika/bio.py:12-263: kmer
enumeration and lexicographic state indexing, multimers, De Bruijn sequences,
complements, kmer-path -> sequence collapse by maximal overlap, and kmer
transition enumeration.  Works with both ``str`` and ``bytes`` alphabets.

In addition to the dict-based mapping, :func:`kmer_state_array` provides a
vectorised numpy encoding (sequence -> int state codes) used by the batched
TPU remapping pipeline.
"""
from itertools import product

import numpy as np

_COMPLEMENT = {'A': 'T', 'T': 'A', 'C': 'G', 'G': 'C', 'X': 'X', 'N': 'N',
               'a': 't', 't': 'a', 'c': 'g', 'g': 'c', 'x': 'x', 'n': 'n',
               '-': '-'}


def all_kmers(length, alphabet='ACGT'):
    """All kmers of ``length``, sorted by the ordering of ``alphabet``.

    A bytes alphabet yields bytes kmers, a str alphabet yields str kmers.
    """
    if isinstance(alphabet, bytes):
        letters = alphabet.decode('utf-8')
        return [''.join(x).encode('utf-8') for x in product(letters, repeat=length)]
    return [''.join(x) for x in product(alphabet, repeat=length)]


def kmer_mapping(length, alphabet='ACGT'):
    """Dictionary mapping kmer to its lexicographic index."""
    return {k: i for i, k in enumerate(all_kmers(length, alphabet))}


def all_multimers(length, alphabet='ACGT'):
    """All multimers up to ``length``, sorted by length then alphabet order.

    Includes the empty multimer at index 0.
    """
    return [''] + [k for n in range(1, length + 1)
                   for k in all_kmers(n, alphabet)]


def multimer_mapping(length, alphabet='ACGT'):
    """Dictionary mapping multimer to an ordering."""
    return {k: i for i, k in enumerate(all_multimers(length, alphabet))}


def de_bruijn(k, n, pad=False):
    """De Bruijn sequence over ``k`` symbols with subsequences of length ``n``.

    Must be cyclically wrapped (or ``pad=True``) to obtain all subsequences.

    Built as the concatenation, in lexicographic order, of every Lyndon word
    over ``k`` symbols whose length divides ``n`` (iterative
    Fredricksen-Kessler-Maiorana necklace enumeration) — this is the
    lexicographically least B(k, n).
    """
    sequence = []
    word = [0]
    while word:
        if n % len(word) == 0:
            sequence.extend(word)
        # successor: repeat periodically to length n, then increment the last
        # symbol that is not maximal (dropping the maximal tail)
        word = [word[i % len(word)] for i in range(n)]
        while word and word[-1] == k - 1:
            word.pop()
        if word:
            word[-1] += 1
    if pad:
        sequence += [0] * (n - 1)
    return sequence


def is_homopolymer(k):
    """Is the kmer a repeat of a single base?"""
    b0 = k[0]
    return all(b == b0 for b in k)


def complement(base, compdict=_COMPLEMENT):
    return compdict[base]


def reverse_complement(seq, compdict=_COMPLEMENT):
    """Reverse complement of a base string."""
    return ''.join(compdict[b] for b in seq)[::-1]


def reverse_complement_kmers(kmers, compdict=_COMPLEMENT):
    """Reverse the kmer list and reverse-complement each kmer."""
    return [reverse_complement(k, compdict) for k in kmers][::-1]


def seq_to_kmers(seq, length):
    """Overlapping kmers of a sequence: 'ATATG',3 -> ['ATA','TAT','ATG']."""
    return [seq[x:x + length] for x in range(0, len(seq) - length + 1)]


def kmer_state_array(seq, length, alphabet=b'ACGT'):
    """Vectorised kmer -> lexicographic state index encoding of a sequence.

    Equivalent to ``[kmer_mapping(length)[k] for k in seq_to_kmers(seq, length)]``
    but computed with numpy (base-``nbase`` positional encoding) so long
    references encode in microseconds.

    :param seq: bytes (or str) sequence over ``alphabet``
    :returns: int32 array of length ``len(seq) - length + 1``
    """
    if isinstance(seq, str):
        seq = seq.encode('utf-8')
    if isinstance(alphabet, str):
        alphabet = alphabet.encode('utf-8')
    nbase = len(alphabet)
    lut = np.full(256, -1, dtype=np.int64)
    for i, b in enumerate(alphabet):
        lut[b] = i
    codes = lut[np.frombuffer(seq, dtype=np.uint8)]
    if np.any(codes < 0):
        raise ValueError("sequence contains letters outside alphabet")
    n = len(codes) - length + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int32)
    out = np.zeros(n, dtype=np.int64)
    for j in range(length):
        out = out * nbase + codes[j:j + n]
    return out.astype(np.int32)


def _overlap_move(k1, k2, allow_identical):
    """Smallest forward shift under which ``k2`` extends ``k1``.

    0 = identical stay (when allowed), len(k1) = no overlap at all.
    """
    if allow_identical and k1 == k2:
        return 0
    return next((m for m in range(1, len(k1)) if k1[m:] == k2[:-m]), len(k1))


def max_overlap(kmers, allow_identical=True):
    """Maximum overlap move from each kmer to the next.

    :param allow_identical: identical neighbours count as a stay (move 0)
    :returns: list of moves, one per adjacent pair
    """
    return [_overlap_move(k1, k2, allow_identical)
            for k1, k2 in zip(kmers, kmers[1:])]


def moves_compatible(kmers, moves):
    """Whether each move is consistent with its adjacent kmer pair."""
    return [(m == 0 and k1 == k2) or k1[m:] == k2[:-m]
            for (k1, k2), m in zip(zip(kmers, kmers[1:]), moves)]


def reduce_kmers(kmers, moves):
    """Collapse a kmer path into a sequence given a list of moves.

    Each moved-into kmer contributes its last ``move`` letters (the whole
    kmer when the move is at least its length); stays contribute nothing.
    """
    assert all(moves_compatible(kmers, moves)), 'Moves not consistent with kmers'
    tails = [k if m >= len(k) else k[-m:]
             for k, m in zip(kmers[1:], moves) if m > 0]
    return kmers[0] + kmers[0][:0].join(tails)


def kmers_to_sequence(kmers, always_move=False):
    """Collapse a kmer path into a sequence by maximal overlap.

    :param always_move: transducer semantics — a kmer may not overlap itself
        entirely (no stays in the path)
    """
    moves = max_overlap(kmers, not always_move)
    return reduce_kmers(kmers, moves)


def kmer_transitions(kmers, proposed_max_move, alphabet='ACGT', forward_only=True):
    """All destination kmers reachable from each source kmer.

    :returns: {source_kmer: [(move, destination_kmer)]}
    """
    k = len(kmers[0])
    assert all(len(x) == k for x in kmers)
    max_move = min(proposed_max_move, k - 1)

    nmers = [all_kmers(n, alphabet=alphabet) for n in range(max_move + 1)]
    trans = {kmer: [] for kmer in kmers}
    for kmer, move in product(kmers, range(max_move + 1)):
        trans[kmer].extend([(move, kmer[move:] + suffix) for suffix in nmers[move]])
        if not forward_only and move > 0:
            trans[kmer].extend([(-1 * move, suffix + kmer[:-move]) for suffix in nmers[move]])
    return trans
