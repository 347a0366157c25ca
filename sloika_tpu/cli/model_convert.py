"""``sloika-model-convert`` — convert models between formats.

The reference's misc/model_convert.py migrated pickles between CPU and GPU
Theano shared variables; with pytree checkpoints that distinction is gone.
This tool converts between the remaining formats: reference Theano pickles
(.pkl), interchange JSON (.json) and checkpoints (.npz).
"""
import argparse

from sloika_tpu.cmdargs import FileExists


def make_parser():
    parser = argparse.ArgumentParser(
        description='Convert a model between .pkl/.json/.npz formats',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('input', action=FileExists,
                        help='Input model (.pkl reference pickle, .json '
                             'interchange dump, or .npz checkpoint)')
    parser.add_argument('output',
                        help='Output model (.json or .npz by extension)')
    return parser


def main(argv=None):
    args = make_parser().parse_args(argv)
    from sloika_tpu import serialize
    from sloika_tpu.cli.basecall import load_model

    layer, params = load_model(args.input)
    if args.output.endswith('.json'):
        serialize.save_model_json(args.output, layer, params)
    elif args.output.endswith('.npz'):
        serialize.save_checkpoint(args.output, layer, params)
    else:
        raise SystemExit('Output must end in .json or .npz')
    print('Wrote {} ({} parameters)'.format(
        args.output, layer.param_count(params)))
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
