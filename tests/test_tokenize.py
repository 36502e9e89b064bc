"""Tokenizer: Spark DataFrame path vs pure-Python twin (Olaf mem-DB pattern).

Mirrors the reference's hand-computed max-filter window tests
(tests/olaf_tests.c:79-114): small fixed inputs, exact expected output.
"""

from __future__ import annotations

from olaf_spark.config import EngineConfig
from olaf_spark.tokenize import doc_lengths_df, term_freqs_df, tokenize_py, tokens_df

CASES = [
    (0, "Hello, World! 42"),
    (1, "the the THE tHe"),
    (2, ""),
    (3, "  --- ,,, !!!  "),
    (4, "a1b2 c-d e_f"),  # '_' is not [a-z0-9] -> splits
    (5, "trailing punctuation!"),
    (6, "unicode café naïve 中文 mixed"),
]


def test_hand_computed():
    assert tokenize_py("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize_py("") == []
    assert tokenize_py("  --- ,,, ") == []
    assert tokenize_py("a1b2 c-d e_f") == ["a1b2", "c", "d", "e", "f"]


def test_spark_matches_python(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"])
        for r in tokens_df(df).collect()
    }
    want = set()
    for doc_id, text in CASES:
        for t in tokenize_py(text):
            want.add((doc_id, t))
    # tokens_df explodes duplicates; compare as multisets via term_freqs
    tf_got = {(r["doc_id"], r["term"]): r["tf"] for r in term_freqs_df(df).collect()}
    tf_want = {}
    for doc_id, text in CASES:
        for t in tokenize_py(text):
            tf_want[(doc_id, t)] = tf_want.get((doc_id, t), 0) + 1
    assert tf_got == tf_want
    assert got == want


def test_doc_lengths(spark):
    df = spark.createDataFrame(CASES, "doc_id long, text string")
    got = {r["doc_id"]: r["doc_len"] for r in doc_lengths_df(df).collect()}
    want = {doc_id: len(tokenize_py(text)) for doc_id, text in CASES}
    assert got == want


def test_min_token_len_filter(spark):
    cfg = EngineConfig(min_token_len=2)
    assert tokenize_py("a bb ccc", cfg) == ["bb", "ccc"]
    df = spark.createDataFrame([(0, "a bb ccc")], "doc_id long, text string")
    got = sorted(r["term"] for r in tokens_df(df, cfg=cfg).collect())
    assert got == ["bb", "ccc"]
