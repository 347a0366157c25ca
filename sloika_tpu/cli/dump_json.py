"""``sloika-dump-json`` — export a model to the JSON interchange format
(reference bin/dump_json.py): structure only, or structure + parameters.
Accepts checkpoints (.npz), model JSON, and reference Theano pickles.
"""
import argparse
import json
import sys

from sloika_tpu.cmdargs import AutoBool, FileExists, display_version_and_exit
from sloika_tpu import __version__


def make_parser():
    parser = argparse.ArgumentParser(
        description='Dump JSON representation of a model',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('--params', default=True, action=AutoBool,
                        help='Include parameters in the dump')
    parser.add_argument('--out_file', default=None,
                        help='Output file (default stdout)')
    parser.add_argument('--version', nargs=0,
                        action=display_version_and_exit(__version__),
                        help='Display version')
    parser.add_argument('model', action=FileExists,
                        help='Checkpoint (.npz), model JSON or reference .pkl')
    return parser


def main(argv=None):
    args = make_parser().parse_args(argv)
    from sloika_tpu.cli.basecall import load_model

    layer, params = load_model(args.model)
    obj = layer.to_json(params if args.params else None)
    out = open(args.out_file, 'w') if args.out_file else sys.stdout
    json.dump(obj, out, indent=2)
    out.write('\n')
    if args.out_file:
        out.close()
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
