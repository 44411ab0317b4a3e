"""Behavioral parity tests against reference tests/test_results.py."""

import numpy as np
import pytest

from tensorcircuit_ng_tpu.results import counts

d = {"000": 2, "101": 3, "100": 4}


def test_marginal_count():
    """reference test_results.py:13."""
    assert counts.marginal_count(d, [1, 2])["00"] == 6
    assert counts.marginal_count(d, [1])["0"] == 9
    assert counts.marginal_count(d, [2, 1, 0])["001"] == 4


def test_merge_count():
    """reference test_results.py:19."""
    c1 = {"00": 10, "01": 20, "11": 30}
    c2 = {"00": 5, "10": 15, "11": 25}
    c3 = {"01": 10, "10": 20}
    merged = counts.merge_count(c1, c2)
    assert merged == {"00": 15, "01": 20, "10": 15, "11": 55}
    merged = counts.merge_count(c1, c2, c3)
    assert merged == {"00": 15, "01": 30, "10": 35, "11": 55}
    assert counts.merge_count(c1) == c1
    assert counts.merge_count({}, {}) == {}
    assert counts.merge_count({}, c1) == c1


def test_sort_count():
    """reference test_results.py:51 — by value desc, stable keys."""
    assert counts.sort_count({}) == {}
    d1 = {"a": 1, "b": 3, "c": 2}
    s1 = counts.sort_count(d1)
    assert list(s1.keys()) == ["b", "c", "a"]
    assert list(s1.values()) == [3, 2, 1]
    d2 = {"a": 2, "b": 2, "c": 1}
    assert list(counts.sort_count(d2).keys()) == ["a", "b", "c"]


def test_reverse_count():
    """reference test_results.py:62."""
    assert counts.reverse_count({}) == {}
    assert counts.reverse_count({"01": 10, "11": 20}) == {"10": 10, "11": 20}


def test_normalized_count():
    """reference test_results.py:69."""
    assert counts.normalized_count({"00": 5, "01": 15}) == {"00": 0.25, "01": 0.75}


def test_count2vec_roundtrip():
    """reference test_results.py:75."""
    assert counts.vec2count(counts.count2vec(d, normalization=False), prune=True) == d


def test_kl():
    """reference test_results.py:85,90 — zero-probability keys contribute 0."""
    a = {"00": 512, "11": 512}
    assert counts.kl_divergence(a, a) == 0
    a = {"00": 0, "01": 2}
    b = {"00": 1, "01": 1}
    assert np.isfinite(counts.kl_divergence(a, b))


def test_expectation_from_counts():
    """reference test_results.py:99 — Z-parity and diagonal-op forms."""
    assert counts.expectation(d, [0, 1]) == pytest.approx(-5 / 9)
    assert counts.expectation(d, None, [[1, -1], [1, 0], [1, 1]]) == pytest.approx(
        -5 / 9
    )
