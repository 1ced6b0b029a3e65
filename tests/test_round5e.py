"""Round-5e tests: winnowing fingerprints (MOSS) and SymSpell
deletion-join fuzzy alias pairs."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from kgx import linking, textops


# ------------------------------------------- winnowing fingerprints ----


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _expected_fps(text: str, k: int = 4, w: int = 5) -> set[int]:
    toks = text.lower().strip().split()
    if len(toks) < k:
        return set()
    hs = [_h60(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    return {
        min(hs[j : j + w]) for j in range(max(len(hs) - w, 0) + 1)
    }


def _winnow(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.winnow_fingerprints(df, **kw)
    got: dict[int, set[int]] = {}
    for r in out.collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    return got


def test_winnow_matches_reference_python(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "one two three four",          # exactly k tokens -> 1 gram, 1 fp
        "a b c d e f",                 # 3 grams < w -> single clipped window
        "too short",                   # < k tokens -> no rows
    ]
    got = _winnow(spark, list(enumerate(texts)))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _expected_fps(t), f"doc {i}"


def test_winnow_shared_substring_guarantee(spark):
    # MOSS guarantee: a shared run of >= w+k-1 = 8 tokens yields at
    # least one shared fingerprint.
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, "xx yy " + shared + " zz"),
        (2, shared + " completely different tail here now"),
    ]
    got = _winnow(spark, rows)
    assert got[1] & got[2], "shared 8-token run must share a fingerprint"


def test_winnow_fps_subset_of_gram_hashes(spark):
    text = "p q r s t u v w x y z p q r"
    toks = text.split()
    all_hashes = {
        _h60(" ".join(toks[i : i + 4])) for i in range(len(toks) - 3)
    }
    got = _winnow(spark, [(7, text)])
    assert got[7] <= all_hashes
    assert len(got[7]) < len(all_hashes)  # winnowing actually thins


# ------------------------------------------- fuzzy alias pairs ----------


def _pairs(spark, words, **kw):
    df = spark.createDataFrame([(w,) for w in words], "w string")
    return {
        (r.w1, r.w2, r.dist)
        for r in linking.fuzzy_alias_pairs(df, **kw).collect()
    }


def test_fuzzy_pairs_substitution_insertion_deletion(spark):
    got = _pairs(spark, ["cat", "bat", "cats", "dog", "dogg", "kat"])
    assert got == {
        ("bat", "cat", 1),   # substitution
        ("cat", "cats", 1),  # insertion
        ("cat", "kat", 1),   # substitution
        ("bat", "kat", 1),   # substitution
        ("dog", "dogg", 1),  # insertion
    }


def test_fuzzy_pairs_transposition_is_not_distance_one(spark):
    # "abc"/"bac" share the deletion keys "ac" and "bc" (candidate),
    # but levenshtein = 2 -> the verify must drop them.
    assert _pairs(spark, ["abc", "bac"]) == set()


def test_fuzzy_pairs_min_len_and_case(spark):
    # words below min_len are excluded on both engines; input is
    # lowercased before anything else.
    got = _pairs(spark, ["ab", "ab1", "CAT", "cAts"])
    assert got == {("cat", "cats", 1)}
