"""Round-4q: exact edit-similarity join with lossless PassJoin segment
filtering (operators/fuzzy.py::edit_similarity_join)."""

from __future__ import annotations

import itertools

import pytest

from anomalydetection_spark.operators.fuzzy import edit_similarity_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _strings_df(spark, strings):
    return spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    )


def _run(spark, strings, k):
    out = edit_similarity_join(_strings_df(spark, strings), "id", "s", k=k)
    return {
        (r["id_a"], r["id_b"], r["edit_distance"]) for r in out.collect()
    }


def _brute(strings, k):
    return {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(strings), 2)
        if _lev(a, b) <= k
    }


def test_planted_edit_kinds(spark):
    base = "the quick brown fox jumps"
    strings = [
        base,
        "the quick brown fox jump",    # 1 deletion
        "the quick brown foxy jumps",  # 1 insertion
        "the quick crown fox jumps",   # 1 substitution
        "a totally different sentence here",
    ]
    got = _run(spark, strings, k=1)
    # brute-force is the contract; the three planted k=1 pairs must be in
    assert got == _brute(strings, 1)
    assert {(0, 1, 1), (0, 2, 1), (0, 3, 1)} <= got
    assert not any(4 in (a, b) for a, b, _ in got)


def test_shifted_segment_is_found(spark):
    # An edit BEFORE the shared segment shifts its position in the
    # probe string: a naive aligned-segment join (own segmentation on
    # both sides) misses this; the +-k position enumeration must not.
    a = "xabcdefghij"
    b = "abcdefghij"  # delete leading x: every char shifts left by 1
    got = _run(spark, [a, b], k=1)
    assert got == {(0, 1, 1)}


def test_brute_force_equivalence(spark):
    # deterministic pseudo-random corpus over a tiny alphabet so true
    # near-pairs are plentiful at several distances
    strings = []
    x = 1234567
    for _ in range(60):
        x = (x * 1103515245 + 12345) % (2**31)
        n = 6 + x % 7
        s = "".join("abcd"[(x >> (3 * j + 1)) % 4] for j in range(n))
        strings.append(s)
    for k in (1, 2):
        assert _run(spark, strings, k=k) == _brute(strings, k)


def test_equal_strings_distance_zero(spark):
    got = _run(spark, ["hello world", "hello world", "hello worlds"], k=1)
    assert got == {(0, 1, 0), (0, 2, 1), (1, 2, 1)}


def test_short_strings_raise_unless_allowed(spark):
    df = _strings_df(spark, ["ab", "abcdef", "abcdeg"])
    with pytest.raises(ValueError, match="allow_short"):
        edit_similarity_join(df, "id", "s", k=2)
    out = edit_similarity_join(df, "id", "s", k=2, allow_short=True)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {(1, 2)}


def test_k_zero_is_exact_duplicate_join(spark):
    got = _run(spark, ["aaa", "aaa", "aab"], k=0)
    assert got == {(0, 1, 0)}
