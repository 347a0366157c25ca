"""Alphabet and state-space accounting.

Mirrors the semantics of /root/reference/sloika/variables.py:1-26: models emit
posteriors over all kmers of length ``kmer`` plus one extra state (the
stay/blank state for transducers, or the "bad" state for non-transducer
models).
"""

DEFAULT_ALPHABET = b"ACGT"
DEFAULT_NBASE = len(DEFAULT_ALPHABET)


def nkmer(kmer, nbase=DEFAULT_NBASE):
    """Number of possible kmers of a given length."""
    return nbase ** kmer


def nstate(kmer, transducer=True, bad_state=True, nbase=DEFAULT_NBASE):
    """Number of states in a model's output distribution.

    One extra state is present when the model is a transducer (stay/blank) or
    has a bad state; the two are never both counted.
    """
    return nkmer(kmer, nbase=nbase) + (transducer or bad_state)
