"""TSV strand-list I/O with required-field checking.

Same behaviour as /root/reference/sloika/fileio.py:26-150: tab-separated
files with a header row, transparent gz/bz2 decompression, structured-array
round trips.
"""

import numpy as np

# numpy dtype kind -> printf conversion ('u' unsigned int vs 'U' unicode!)
_KIND_FMT = {'i': 'i', 'u': 'i', 'b': 'i', 'f': 'f', 'd': 'f',
             'S': 's', 'U': 's', 'O': 's'}


def _open(fname, mode='rt'):
    if fname.endswith('.gz'):
        import gzip
        return gzip.open(fname, mode)
    if fname.endswith('.bz2'):
        import bz2
        return bz2.open(fname, mode)
    return open(fname, mode)


def _numpyfmt(a):
    kinds = (np.dtype(s[1]).kind for s in a.dtype.descr)
    return ['%' + _KIND_FMT.get(k, 's') for k in kinds]


def file_has_fields(fname, fields=None):
    """Check that a tsv file's header contains the given fields."""
    if fields is None:
        return True
    if isinstance(fields, str):
        fields = [fields]
    if len(fields) == 0:
        return True
    with _open(fname) as fh:
        header = fh.readline().strip().split('\t')
    return all(f in header for f in fields)


def readtsv(fname, fields=None, **kwargs):
    """Read a tsv file into a structured array, checking required fields."""
    if not file_has_fields(fname, fields):
        raise KeyError('File {} does not contain requested required fields {}'
                       .format(fname, fields))
    for k in ['names', 'delimiter', 'dtype']:
        kwargs.pop(k, None)
    with _open(fname) as fh:
        table = np.genfromtxt(fh, names=True, delimiter='\t', dtype=None,
                              encoding=None, **kwargs)
    return table.reshape(-1)


def savetsv(fname, X, header=True):
    """Save a structured array as tsv."""
    head = '\t'.join(X.dtype.names) if header else ''
    fmt = '\t'.join(_numpyfmt(X))
    np.savetxt(fname, X, fmt=fmt, header=head, comments='', delimiter='\t')


def read_chunks(fname, chunk_size=100):
    """Yield successive lists of ``chunk_size`` lines (header excluded from
    counting on first chunk)."""
    with _open(fname) as fh:
        chunk = []
        for line in fh:
            chunk.append(line)
            if len(chunk) >= chunk_size:
                yield chunk
                chunk = []
        if chunk:
            yield chunk
