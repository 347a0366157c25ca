"""``sloika-extract-reference`` — pull per-read reference FASTA out of fast5s
(reference bin/extract_reference.py).
"""
import argparse
import sys
from concurrent.futures import ThreadPoolExecutor

from sloika_tpu.cmdargs import (FileExists, Maybe, Positive,
                                display_version_and_exit)
from sloika_tpu import __version__


def make_parser():
    parser = argparse.ArgumentParser(
        description='Extract per-read reference sequences from fast5 files',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--jobs', default=8, type=Positive(int),
                        help='Host threads')
    parser.add_argument('--limit', default=None, type=Maybe(Positive(int)),
                        help='Limit number of reads')
    parser.add_argument('--section', default='template',
                        choices=['template', 'complement'])
    parser.add_argument('--strand_list', default=None, action=FileExists,
                        help='Strand list restricting reads')
    parser.add_argument('--output', default=None,
                        help='Output FASTA (default stdout)')
    parser.add_argument('--version', nargs=0,
                        action=display_version_and_exit(__version__),
                        help='Display version')
    parser.add_argument('input_folder', action=FileExists,
                        help='Directory containing fast5 files')
    return parser


def reference_extraction_worker(file_name, section):
    from sloika_tpu.data.fast5 import Fast5
    try:
        with Fast5(file_name) as f5:
            return f5.filename_short, f5.get_reference_fasta(section=section)
    except Exception as e:
        sys.stderr.write('Failure reading reference from {}.\n{}\n'.format(
            file_name, repr(e)))
        return None


def main(argv=None):
    args = make_parser().parse_args(argv)
    from sloika_tpu.data.fast5 import iterate_fast5

    files = list(iterate_fast5(args.input_folder, paths=True,
                               limit=args.limit,
                               strand_list=args.strand_list))
    out = open(args.output, 'w') if args.output else sys.stdout
    with ThreadPoolExecutor(max_workers=args.jobs) as pool:
        for res in pool.map(
                lambda fn: reference_extraction_worker(fn, args.section),
                files):
            if res is not None:
                name, seq = res
                if isinstance(seq, bytes):
                    seq = seq.decode('ascii')
                out.write('>{}\n{}\n'.format(name, seq))
    if args.output:
        out.close()
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
