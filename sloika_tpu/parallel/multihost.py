"""Multi-process (multi-host) scatter/gather for the data pipelines.

The reference scaled basecalling with one worker pool per machine
(/root/reference/bin/basecall_network.py:100-101).  The multi-host analogue
here: every process takes a deterministic strided share of the read list
(:func:`process_shard`), basecalls it on its *local* devices, and the
formatted records are gathered to every process (:func:`allgather_bytes`,
riding the same distributed runtime the trainer uses) so rank 0 can write
one merged FASTA in the original read order — byte-identical to a
single-process run (tests/test_multihost.py).
"""
import json

import numpy as np


def process_shard(items, with_indices=False):
    """This process's strided share of ``items``.

    Strided (``items[pid::nproc]``) rather than blocked so the per-process
    load stays balanced when read sizes trend over the listing order.
    """
    import jax
    pid, nproc = jax.process_index(), jax.process_count()
    if with_indices:
        return list(enumerate(items))[pid::nproc]
    return list(items)[pid::nproc]


def allgather_bytes(payload):
    """Gather one ``bytes`` payload from every process to all processes.

    Returns a list indexed by process id.  Single-process: identity.
    Payloads ride the distributed runtime as padded uint8 device arrays
    (two collectives: lengths, then data).
    """
    import jax
    if jax.process_count() == 1:
        return [payload]
    from jax.experimental import multihost_utils
    lens = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int64))).reshape(-1)
    L = max(1, int(lens.max()))
    buf = np.zeros(L, np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    bufs = np.asarray(multihost_utils.process_allgather(buf))
    bufs = bufs.reshape(len(lens), -1)
    return [bufs[p, :int(lens[p])].tobytes() for p in range(len(lens))]


def gather_bytes_to_rank0(payload):
    """Gather one ``bytes`` payload from every process to rank 0 only.

    :returns: list indexed by process id on rank 0; ``None`` elsewhere.
        Single-process: ``[payload]``.

    One collective round per source rank, so every process's peak memory
    is O(largest single payload); only rank 0 accumulates the full set
    (it is the one that writes it).  A plain allgather would instead give
    EVERY host an O(total dataset) copy it never reads.
    """
    import jax
    if jax.process_count() == 1:
        return [payload]
    from jax.experimental import multihost_utils
    pid, nproc = jax.process_index(), jax.process_count()
    lens = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int64))).reshape(-1)
    out = [] if pid == 0 else None
    for r in range(nproc):
        buf = np.zeros(max(1, int(lens[r])), np.uint8)
        if pid == r:
            buf[:len(payload)] = np.frombuffer(payload, np.uint8)
        bufs = np.asarray(multihost_utils.process_allgather(buf))
        if pid == 0:
            out.append(bufs.reshape(nproc, -1)[r, :int(lens[r])].tobytes())
    return out


def gather_indexed_arrays(records):
    """Gather per-item numpy-array dicts from every process to rank 0,
    merged and sorted by original index.

    :param records: list of ``(index, {name: ndarray})`` pairs, the
        indices being positions in the globally-agreed item list (so the
        merged result is ordered exactly as a single-process run).
    :returns: on rank 0, list of ``(index, {name: ndarray})`` sorted by
        index — the union over all processes; ``[]`` on other ranks.
        Single-process: a sorted copy.

    Arrays ride :func:`gather_bytes_to_rank0` as one ``.npz`` payload per
    process (key ``"<index>::<name>"``).
    """
    import io
    flat = {}
    for idx, rec in records:
        for k, v in rec.items():
            flat["{}::{}".format(idx, k)] = np.asarray(v)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    payloads = gather_bytes_to_rank0(buf.getvalue())
    if payloads is None:
        return []
    merged = {}
    for payload in payloads:
        with np.load(io.BytesIO(payload), allow_pickle=False) as z:
            for key in z.files:
                idx, name = key.split("::", 1)
                merged.setdefault(int(idx), {})[name] = z[key]
    return sorted(merged.items())


def allgather_records(records):
    """Gather a list of JSON-serialisable records from every process and
    return the concatenated list (all processes see the same result)."""
    payloads = allgather_bytes(json.dumps(records).encode())
    out = []
    for p in payloads:
        out.extend(json.loads(p.decode()))
    return out
