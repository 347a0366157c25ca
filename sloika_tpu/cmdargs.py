"""Typed argparse extension kit.

Re-implementation of the argument-parsing helpers the reference CLIs use
(/root/reference/sloika/cmdargs.py): paired --foo/--no-foo boolean flags,
bounded numeric types, optional ("Maybe") values, named-tuple multi-args,
file existence checks and byte strings.
"""
import argparse
import os
from collections import namedtuple


class AutoBool(argparse.Action):
    """--foo / --no-foo paired flags (cmdargs.py:137-171)."""

    def __init__(self, option_strings, dest, default=None, required=False,
                 help=None):
        assert default is not None, "AutoBool requires a default"
        opts = []
        for opt in option_strings:
            assert opt.startswith('--'), "AutoBool only supports long flags"
            opts += [opt, '--no_' + opt[2:], '--no-' + opt[2:]]
        if help is not None:
            help += ' (default: {})'.format('enabled' if default else 'disabled')
        super().__init__(opts, dest, nargs=0, const=None, default=default,
                         required=required, help=help)

    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest,
                not option_string.startswith(('--no_', '--no-')))


def Maybe(mytype):
    """Value of ``mytype``, or None when given 'None' (cmdargs.py:174-199)."""
    def converter(argument):
        if argument == 'None':
            return None
        return mytype(argument)
    converter.__name__ = 'maybe_{}'.format(getattr(mytype, '__name__', 'val'))
    return converter


def Bounded(mytype, lower=None, upper=None):
    def converter(argument):
        val = mytype(argument)
        if lower is not None and val < lower:
            raise argparse.ArgumentTypeError(
                '{} must be >= {}'.format(val, lower))
        if upper is not None and val > upper:
            raise argparse.ArgumentTypeError(
                '{} must be <= {}'.format(val, upper))
        return val
    converter.__name__ = 'bounded_{}'.format(getattr(mytype, '__name__', 'val'))
    return converter


def NonNegative(mytype):
    return Bounded(mytype, lower=mytype(0))


def Positive(mytype):
    def converter(argument):
        val = mytype(argument)
        if val <= 0:
            raise argparse.ArgumentTypeError('{} must be positive'.format(val))
        return val
    converter.__name__ = 'positive_{}'.format(getattr(mytype, '__name__', 'val'))
    return converter


def proportion(argument):
    """Float in [0, 1]."""
    return Bounded(float, 0.0, 1.0)(argument)


class FileExists(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        if not os.path.exists(values):
            raise RuntimeError("File/path for '{}' does not exist, {}".format(
                self.dest, values))
        setattr(namespace, self.dest, values)


class FileAbsent(argparse.Action):
    def __call__(self, parser, namespace, values, option_string=None):
        if os.path.exists(values):
            raise RuntimeError("File/path for '{}' exists, {}".format(
                self.dest, values))
        setattr(namespace, self.dest, values)


class ParseToNamedTuple(argparse.Action):
    """Parse nargs values into a named tuple with typed fields
    (cmdargs.py:78-99); used e.g. for ``--adam rate decay1 decay2``."""

    def __init__(self, option_strings, dest, nargs=None, metavar=None,
                 default=None, type=None, required=False, help=None):
        assert nargs is not None and metavar is not None and type is not None
        assert len(metavar) == nargs and len(type) == nargs
        self._types = type
        self.Values = namedtuple('Values', metavar)
        if default is not None:
            default = self.Values(*default)
        super().__init__(option_strings, dest, nargs=nargs, metavar=metavar,
                         default=default, required=required, help=help)

    def __call__(self, parser, namespace, values, option_string=None):
        setattr(namespace, self.dest,
                self.Values(*[t(v) for t, v in zip(self._types, values)]))


def ByteString(argument):
    return argument.encode('utf-8')


class ExpandRanges(argparse.Action):
    """Expand '1,3-5,7' into [1, 3, 4, 5, 7]."""

    def __call__(self, parser, namespace, values, option_string=None):
        out = []
        for part in values.split(','):
            if '-' in part:
                lo, hi = map(int, part.split('-'))
                out.extend(range(lo, hi + 1))
            else:
                out.append(int(part))
        setattr(namespace, self.dest, out)


def Vector(mytype):
    """Comma-separated vector of ``mytype``."""
    def converter(argument):
        return [mytype(v) for v in argument.split(',')]
    return converter


def display_version_and_exit(version):
    class _Action(argparse.Action):
        def __call__(self, parser, namespace, values, option_string=None):
            print(version)
            raise SystemExit(0)
    return _Action
