"""Typed argparse kit tests (reference test_cmdargs.py patterns)."""
import argparse

import pytest

from sloika_tpu import cmdargs


def make(action=None, **kwargs):
    p = argparse.ArgumentParser()
    p.add_argument('--flag', action=action, **kwargs) if action else None
    return p


def test_autobool():
    p = argparse.ArgumentParser()
    p.add_argument('--thing', default=True, action=cmdargs.AutoBool,
                   help='a thing')
    assert p.parse_args([]).thing is True
    assert p.parse_args(['--no_thing']).thing is False
    assert p.parse_args(['--no-thing']).thing is False
    assert p.parse_args(['--thing']).thing is True


def test_maybe():
    conv = cmdargs.Maybe(int)
    assert conv('None') is None
    assert conv('5') == 5


def test_bounded_positive_proportion():
    assert cmdargs.Positive(int)('3') == 3
    with pytest.raises(argparse.ArgumentTypeError):
        cmdargs.Positive(int)('0')
    assert cmdargs.NonNegative(float)('0') == 0.0
    with pytest.raises(argparse.ArgumentTypeError):
        cmdargs.NonNegative(float)('-1')
    assert cmdargs.proportion('0.5') == 0.5
    with pytest.raises(argparse.ArgumentTypeError):
        cmdargs.proportion('1.5')


def test_parse_to_namedtuple():
    p = argparse.ArgumentParser()
    p.add_argument('--adam', nargs=3, metavar=('rate', 'decay1', 'decay2'),
                   default=(1e-3, 0.9, 0.999),
                   type=(float, float, float),
                   action=cmdargs.ParseToNamedTuple)
    args = p.parse_args([])
    assert args.adam.rate == 1e-3
    args = p.parse_args(['--adam', '0.01', '0.8', '0.99'])
    assert args.adam.decay1 == 0.8


def test_expand_ranges():
    p = argparse.ArgumentParser()
    p.add_argument('--r', action=cmdargs.ExpandRanges)
    assert p.parse_args(['--r', '1,3-5,7']).r == [1, 3, 4, 5, 7]


def test_vector_and_bytestring():
    assert cmdargs.Vector(int)('1,2,3') == [1, 2, 3]
    assert cmdargs.ByteString('ACGT') == b'ACGT'


def test_file_exists(tmp_path):
    f = tmp_path / "x.txt"
    f.write_text("hi")
    p = argparse.ArgumentParser()
    p.add_argument('path', action=cmdargs.FileExists)
    assert p.parse_args([str(f)]).path == str(f)
    with pytest.raises(RuntimeError):
        p.parse_args([str(tmp_path / "missing")])
