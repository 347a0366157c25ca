"""Chunkify mains: identity / remap / raw_identity / raw_remap.

Equivalents of /root/reference/sloika/tools/chunkify_with_identity.py,
chunkify_with_remap.py and chunkify_raw.py mains.  Host-side per-read work
(fast5 reading, trimming, chunk reshaping) runs in a thread pool; the remap
variants run the model forward and the alignment DP batched on the device
(:mod:`sloika_tpu.remap`) instead of per-read in worker processes.

Under a multi-process runtime (``jax.distributed``) every main shards the
read list per process, works on local devices, and gathers per-read
results to rank 0, which writes HDF5/strand-list outputs identical to a
single-process run (see :func:`_finalise`).
"""
import os
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from sloika_tpu import util
from sloika_tpu.data import batching, hdf5, raw_chunkify
from sloika_tpu.data.fast5 import Fast5, iterate_fast5


def _finalise(args, records, input_type, strand_header=None,
              strand_path=None):
    """Merge per-read results across processes and write outputs on rank 0.

    Multi-host chunkify: each process handles a strided share of the read
    list on its local devices (the remap mains' device DP included); the
    per-read arrays are gathered over the distributed runtime and rank 0
    writes the HDF5 (+ strand list) ordered exactly as a single-process
    run (tests/test_multihost.py) — the scale-out analogue of the
    reference's per-host worker pools (chunkify_raw.py:392-461 runs one
    process pool on one machine).
    """
    import jax
    from sloika_tpu.parallel import multihost
    records = multihost.gather_indexed_arrays(records)
    if jax.process_index() != 0:
        return
    if strand_path is not None:
        with open(strand_path, 'w') as slfh:
            slfh.write(strand_header)
            for _, rec in records:
                slfh.write(rec["strand"].tobytes().decode())
    chunk_list = [rec["chunks"] for _, rec in records]
    label_list = [rec["labels"] for _, rec in records]
    bad_list = [rec["bad"] for _, rec in records]
    _write_output(args, chunk_list, label_list, bad_list, input_type)


def _process_share(files):
    """This process's (original_index, filename) share of the read list."""
    from sloika_tpu.parallel import multihost
    return multihost.process_shard(files, with_indices=True)


def _write_output(args, chunk_list, label_list, bad_list, input_type):
    if not chunk_list:
        print("no chunks were produced", file=sys.stderr)
        sys.exit(1)
    print('\n* Writing out to HDF5')
    attrs = {
        'chunk': args.chunk_len,
        'input_type': input_type,
        'kmer': args.kmer_len,
        'normalisation': args.normalisation,
        'section': getattr(args, 'section', 'template'),
        'trim': list(args.trim),
        'alphabet': args.alphabet,
    }
    if input_type == 'raw':
        attrs['downsample_factor'] = args.downsample_factor
        attrs['interpolation'] = args.interpolation
    blanks_per_chunk = np.concatenate([(l == 0).mean(1) for l in label_list])
    blanks = np.percentile(blanks_per_chunk, args.blanks_percentile)
    hdf5.create_labelled_chunks_hdf5(args.output, blanks, attrs, chunk_list,
                                     label_list, bad_list)


def _guard_overwrite(args, *paths):
    if not args.overwrite:
        for p in paths:
            if p and os.path.exists(p):
                print("Cowardly refusing to overwrite {}".format(p))
                sys.exit(1)


# ---------------------------------------------------------------------------
# Event-domain identity
# ---------------------------------------------------------------------------

def chunkify_with_identity_main(args):
    """Chunk mapped event files (reference chunkify_with_identity.py:11-55)."""
    _guard_overwrite(args, args.output)
    files = list(iterate_fast5(args.input_folder, paths=True,
                               limit=args.limit,
                               strand_list=args.input_strand_list))
    print('* Processing data using', args.jobs, 'threads')

    def worker(fn):
        try:
            with Fast5(fn) as f5:
                ev, _ = f5.get_any_mapping_data(args.section)
        except Exception as e:
            sys.stderr.write('Failed to get mapping data from {}.\n{}\n'
                             .format(fn, repr(e)))
            return None
        try:
            # per-read fault masking (e.g. kmers outside the alphabet must
            # not abort the whole run — reference chunk_worker semantics)
            ev = batching.trim_ends_and_filter(ev, tuple(args.trim),
                                               args.min_length,
                                               args.chunk_len)
            if ev is None:
                sys.stderr.write('{} is too short.\n'.format(fn))
                return None
            return batching.chunkify(ev, args.chunk_len, args.kmer_len,
                                     args.use_scaled, args.normalisation,
                                     alphabet=args.alphabet)
        except Exception as e:
            sys.stderr.write('Failed to chunk {}.\n{}\n'.format(fn, repr(e)))
            return None

    share = _process_share(files)
    records = []
    i = 0
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        for (idx, _), res in zip(share,
                                 pool.map(worker, [fn for _, fn in share])):
            if res is not None:
                i = util.progress_report(i)
                chunks, labels, bad_ev = res
                records.append((idx, {"chunks": chunks, "labels": labels,
                                      "bad": bad_ev}))
    _finalise(args, records, 'events')


# ---------------------------------------------------------------------------
# Raw identity
# ---------------------------------------------------------------------------

def raw_chunkify_with_identity_main(args):
    """Chunk raw signal using in-file mapping tables
    (reference chunkify_raw.py:341-389)."""
    _guard_overwrite(args, args.output)
    files = list(iterate_fast5(args.input_folder, paths=True,
                               limit=args.limit,
                               strand_list=args.input_strand_list))
    print('* Processing data using', args.jobs, 'threads')

    def worker(fn):
        try:
            with Fast5(fn) as f5:
                mapping_table, att = f5.get_any_mapping_data('template')
                sig = f5.get_read(raw=True)
                sample_rate = f5.sample_rate
                start_sample = f5.raw_start_sample
        except Exception as e:
            sys.stderr.write('Failed to get mapping data from {}.\n{}\n'
                             .format(fn, repr(e)))
            return None
        try:
            # per-read fault masking, like the remap workers: one malformed
            # mapping table (empty, unregistered offsets, foreign alphabet)
            # must not abort a multi-hour chunkify run
            mapping_table = raw_chunkify.convert_mapping_times_to_samples(
                mapping_table, start_sample, sample_rate)
            map_start = mapping_table['start'][0] + args.trim[0]
            map_end = (mapping_table['start'][-1]
                       + mapping_table['length'][-1] - args.trim[1])
            mapped_signal, mapping_table = \
                raw_chunkify.trim_signal_and_mapping(
                    sig, mapping_table, map_start, map_end)
            if not raw_chunkify.mapping_table_is_registered(mapped_signal,
                                                            mapping_table):
                sys.stderr.write('Failed to register signal and mapping in '
                                 '{}.\n'.format(fn))
                return None
            if len(mapped_signal) < max(args.chunk_len, args.min_length):
                sys.stderr.write('{} is too short.\n'.format(fn))
                return None
            return raw_chunkify.raw_chunkify(
                mapped_signal, mapping_table, args.chunk_len, args.kmer_len,
                args.normalisation, args.downsample_factor,
                args.interpolation, att, alphabet=args.alphabet)
        except Exception as e:
            sys.stderr.write('Failed to chunk {}.\n{}\n'.format(fn, repr(e)))
            return None

    share = _process_share(files)
    records = []
    i = 0
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        for (idx, _), res in zip(share,
                                 pool.map(worker, [fn for _, fn in share])):
            if res is not None:
                i = util.progress_report(i)
                chunks, labels, bad_ev = res
                records.append((idx, {
                    "chunks": np.ascontiguousarray(chunks),
                    "labels": np.ascontiguousarray(labels),
                    "bad": np.ascontiguousarray(bad_ev)}))
    _finalise(args, records, 'raw')


# ---------------------------------------------------------------------------
# Remap variants (batched TPU model forward + alignment DP)
# ---------------------------------------------------------------------------

def _load_remap_model(args):
    from sloika_tpu.cli.basecall import load_model
    from sloika_tpu.remap import Remapper
    layer, params = load_model(args.model)
    band = getattr(args, 'band', 'auto')
    if band == 'exact':
        band = None
    elif band != 'auto':
        band = int(band)
    mesh = None
    if getattr(args, 'devices', 1) > 1:
        from sloika_tpu.parallel import mesh as meshlib
        mesh = meshlib.make_mesh(args.devices)
    return Remapper(layer, params, args.kmer_len, min_prob=args.min_prob,
                    slip=args.slip, prior=tuple(args.prior),
                    alphabet=args.alphabet, batch_size=args.batch, band=band,
                    mesh=mesh)


def raw_chunkify_with_remap_main(args):
    """Remap raw reads against references, then chunk
    (reference chunkify_raw.py:392-461)."""
    _guard_overwrite(args, args.output, args.output_strand_list)
    files = list(iterate_fast5(args.input_folder, paths=True,
                               limit=args.limit,
                               strand_list=args.input_strand_list))
    references = util.fasta_file_to_dict(args.references)
    remapper = _load_remap_model(args)

    dac_wire = getattr(args, 'dac', False)

    # host side: load + trim signals
    def load(fn):
        if dac_wire:
            from sloika_tpu.basecall import load_raw_dac
            r = load_raw_dac(fn, trim=tuple(args.trim),
                             open_pore_fraction=args.open_pore_fraction)
            if r is None:
                return None
            sn, dac, norm4 = r
            if sn not in references:
                sys.stderr.write('No reference found for {}.\n'.format(sn))
                return None
            if len(dac) < max(args.chunk_len, args.min_length):
                sys.stderr.write('{} is too short.\n'.format(fn))
                return None
            # scaled (un-normalised) f32 signal for chunk building — same
            # arithmetic as the device, <=2 ulp from the float64 loader
            from sloika_tpu.basecall import scale_dac_f32
            signal = scale_dac_f32(dac, norm4[0], norm4[1])
            return sn, signal, (dac, norm4)
        try:
            with Fast5(fn) as f5:
                signal = f5.get_read(raw=True)
                sn = f5.filename_short
        except Exception as e:
            sys.stderr.write('Failure reading {}.\n{}\n'.format(fn, repr(e)))
            return None
        if sn not in references:
            sys.stderr.write('No reference found for {}.\n'.format(sn))
            return None
        signal = batching.trim_open_pore(signal, args.open_pore_fraction)
        signal = util.trim_array(signal, *args.trim)
        if len(signal) < max(args.chunk_len, args.min_length):
            sys.stderr.write('{} is too short.\n'.format(fn))
            return None
        return sn, signal

    share = _process_share(files)
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        loaded = [(idx, r) for (idx, _), r in
                  zip(share, pool.map(load, [fn for _, fn in share]))
                  if r is not None]
    indices = [i for i, _ in loaded]
    names = [r[0] for _, r in loaded]
    raw_signals = [r[1] for _, r in loaded]
    refs = [references[n] for n in names]

    print('* Remapping {} reads on device'.format(len(names)))
    if dac_wire:
        results = remapper.remap_dac_signals([r[2] for _, r in loaded], refs)
    else:
        norm_signals = [batching.normalise_raw_signal(s)
                        for s in raw_signals]
        results = remapper.remap_signals(norm_signals, refs)

    records = []
    i = 0
    for idx, sn, signal, res in zip(indices, names, raw_signals, results):
        if res is None:
            continue
        score, mapping_table, path, seq = res
        mapping_attrs = {'reference': references[sn], 'direction': '+',
                         'ref_start': 0}
        try:
            chunks, labels, bad_ev = raw_chunkify.raw_chunkify(
                signal.astype(np.float32), mapping_table, args.chunk_len,
                args.kmer_len, args.normalisation, args.downsample_factor,
                args.interpolation, mapping_attrs, alphabet=args.alphabet)
        except Exception as e:
            sys.stderr.write('Failure chunking {}.\n{}\n'.format(sn, repr(e)))
            continue
        i = util.progress_report(i)
        row = '\t'.join(str(x) for x in [
            sn + '.fast5', len(mapping_table), -score / len(mapping_table),
            int(np.sum(np.ediff1d(path, to_begin=1) == 0)), len(seq),
            int(path.min()), int(path.max())]) + '\n'
        records.append((idx, {"chunks": chunks, "labels": labels,
                              "bad": bad_ev,
                              "strand": np.frombuffer(row.encode(),
                                                      np.uint8)}))
    _finalise(args, records, 'raw',
              strand_header='\t'.join(['filename', 'nblocks', 'score',
                                       'nstay', 'seqlen', 'start',
                                       'end']) + '\n',
              strand_path=args.output_strand_list)


def chunkify_with_remap_main(args):
    """Remap event reads against references, then chunk
    (reference chunkify_with_remap.py:11-79, batch.py:143-190)."""
    import numpy.lib.recfunctions as nprf
    from sloika_tpu.data import features as features_mod

    _guard_overwrite(args, args.output, args.output_strand_list)
    if getattr(args, 'dac', False):
        sys.stderr.write('--dac applies to raw_remap only (event features '
                         'are not DAC samples); ignored.\n')
    files = list(iterate_fast5(args.input_folder, paths=True,
                               limit=args.limit,
                               strand_list=args.input_strand_list))
    references = util.fasta_file_to_dict(args.references)
    remapper = _load_remap_model(args)

    def load(fn):
        try:
            with Fast5(fn) as f5:
                sn = f5.filename_short
                # the reference falls back to get_basecall_data when the
                # segmentation analysis has no section events
                # (batch.py:168-171); in this fast5 shim both calls read
                # the same Basecall_1D/2D event table, so a separate
                # fallback would be a no-op
                ev = f5.get_section_events(args.section,
                                           analysis=args.segmentation)
        except Exception as e:
            sys.stderr.write('Failure reading events from {}.\n{}\n'
                             .format(fn, repr(e)))
            return None
        if sn not in references:
            sys.stderr.write('No reference found for {}.\n'.format(sn))
            return None
        try:
            ev = batching.trim_ends_and_filter(ev, tuple(args.trim),
                                               args.min_length,
                                               args.chunk_len)
        except Exception as e:
            sys.stderr.write('Failure trimming events from {}.\n{}\n'
                             .format(fn, repr(e)))
            return None
        if ev is None:
            sys.stderr.write('{} is too short.\n'.format(fn))
            return None
        return sn, ev

    share = _process_share(files)
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        loaded = [(idx, r) for (idx, _), r in
                  zip(share, pool.map(load, [fn for _, fn in share]))
                  if r is not None]
    indices = [i for i, _ in loaded]
    names = [r[0] for _, r in loaded]
    events = [r[1] for _, r in loaded]
    feats = [features_mod.from_events(ev, tag='') for ev in events]
    refs = [references[n] for n in names]

    print('* Remapping {} reads on device'.format(len(names)))
    results = remapper.remap_signals(feats, refs)

    from sloika_tpu import bio
    records = []
    i = 0
    for idx, sn, ev, res in zip(indices, names, events, results):
        if res is None:
            continue
        score, _mapping, path, seq = res
        kmers = np.array(bio.seq_to_kmers(references[sn], args.kmer_len))
        ev2 = nprf.append_fields(
            ev, ['seq_pos', 'kmer', 'good_emission'],
            [path, kmers[path], np.repeat(True, len(ev))])
        try:
            chunks, labels, bad_ev = batching.chunkify(
                ev2, args.chunk_len, args.kmer_len, args.use_scaled,
                args.normalisation, alphabet=args.alphabet)
        except Exception as e:
            sys.stderr.write('Failure chunking {}.\n{}\n'.format(sn, repr(e)))
            continue
        i = util.progress_report(i)
        row = '\t'.join(str(x) for x in [
            sn + '.fast5', len(ev), -score / len(ev),
            int(np.sum(np.ediff1d(path, to_begin=1) == 0)), len(seq),
            int(path.min()), int(path.max())]) + '\n'
        records.append((idx, {"chunks": chunks, "labels": labels,
                              "bad": bad_ev,
                              "strand": np.frombuffer(row.encode(),
                                                      np.uint8)}))
    _finalise(args, records, 'events',
              strand_header='\t'.join(['filename', 'nev', 'score', 'nstay',
                                       'seqlen', 'start', 'end']) + '\n',
              strand_path=args.output_strand_list)
