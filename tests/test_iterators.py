"""Iterator-helper tests (reference iterators.py:245-283 semantics)."""
import pytest

from sloika_tpu import iterators as it


def test_window():
    assert list(it.window([1, 2, 3, 4, 5], 3)) == [
        (1, 2, 3), (2, 3, 4), (3, 4, 5)]
    assert list(it.window([1, 2], 3)) == []
    assert list(it.window(iter("abc"), 1)) == [("a",), ("b",), ("c",)]
    with pytest.raises(ValueError):
        list(it.window([1], 0))


def test_centered_truncated_window_reference_example():
    # the reference docstring's own example (iterators.py:264-266)
    assert list(it.centered_truncated_window([1, 2, 3, 4, 5], 3)) == [
        (1, 2), (1, 2, 3), (2, 3, 4), (3, 4, 5), (4, 5)]


def test_centered_truncated_window_even_pads_right():
    # even sizes put the extra context on the right ("will pad on the
    # right more")
    assert list(it.centered_truncated_window([1, 2, 3, 4, 5, 6], 4)) == [
        (1, 2, 3), (1, 2, 3, 4), (2, 3, 4, 5), (3, 4, 5, 6),
        (4, 5, 6), (5, 6)]
    # output length always equals input length
    for size in (1, 2, 3, 4, 5, 7):
        out = list(it.centered_truncated_window(range(9), size))
        assert len(out) == 9


def test_empty_iterator():
    empty, rest = it.empty_iterator(iter([]))
    assert empty and list(rest) == []
    empty, rest = it.empty_iterator(iter([1, 2]))
    assert not empty
    assert list(rest) == [1, 2]          # nothing lost to the probe


def test_take_blocker_pairwise():
    assert it.take(3, range(10)) == [0, 1, 2]
    assert list(it.blocker(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
    assert list(it.blocker([], 3)) == []
    assert list(it.pairwise([1, 2, 3])) == [(1, 2), (2, 3)]
