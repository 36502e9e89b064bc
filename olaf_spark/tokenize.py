"""Tokenizer — the engine's "fingerprint extractor".

Reference analogue: Olaf's event-point + fingerprint extraction
(`olaf_ep_extractor.c`, `olaf_fp_extractor.c`) turns an audio stream into
(hash, time) pairs; our tokenizer turns a document into (term, position)
pairs and aggregates to (term, doc_id, tf).

Two implementations with identical output, mirroring the reference's
mem-DB-vs-LMDB cross-check pattern (`olaf.c:66-69`):

  * ``tokens_df`` / ``term_freqs_df`` — pure DataFrame ops (JVM-side,
    whole-stage-codegen; the production path: no Python in the hot loop).
  * ``tokenize_py`` — pure-Python twin used by the oracle engine and tests.

The tokenizer contract is ``lower(text)`` split on ``TOKEN_SPLIT_RE``
(config.py) with empty and over-long tokens dropped; it must never change
independently of the index (olaf_config.h:46-50 invariant).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olaf_spark.config import EngineConfig

_DEFAULT = EngineConfig()


def _token_filter(col: Column, cfg: EngineConfig) -> Column:
    return (F.length(col) >= cfg.min_token_len) & (F.length(col) <= cfg.max_token_len)


def tokens_array(text_col: Column, cfg: EngineConfig = _DEFAULT) -> Column:
    """Column expression: text -> array<string> of tokens (JVM-side)."""
    arr = F.split(F.lower(text_col), cfg.token_split_re)
    return F.filter(arr, lambda t: _token_filter(t, cfg) & (t != F.lit("")))


def tokens_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = _DEFAULT,
    with_pos: bool = False,
) -> DataFrame:
    """(doc_id, term [, pos]) — one row per token occurrence.

    ``pos`` is the 0-based token position (Olaf's timeIndex analogue),
    counted over the KEPT tokens — so the with_pos path must posexplode
    the filtered array. The position-less path instead explodes the RAW
    split array and filters rows afterwards: explode(filter(arr, p)) ==
    filter(explode(arr), p) row-for-row (split never returns an empty
    array, and an all-dropped array yields no rows either way), and the
    row-filter form stays in whole-stage codegen where the lambda-filtered
    generate measured 2.2x slower (r6: 1.90 s -> 0.85 s at 50k docs).
    ``length >= max(1, min_token_len)`` keeps the HOF form's explicit
    empty-token drop even for min_token_len = 0.
    """
    # the split expression is INLINED into the generator, never projected
    # into a column first: a generator over a plain column reference
    # triggers InferFiltersFromGenerate, whose size(..)>0/isnotnull guard
    # re-evaluates the split TWICE per row below any exchange (measured
    # 3x the whole tokenize cost); over a non-trivial child the rule
    # skips, and split() never returns null or an empty array anyway
    arr = F.split(F.lower(F.col(text_col)), cfg.token_split_re)
    if with_pos:
        kept = F.filter(arr, lambda t: _token_filter(t, cfg) & (t != F.lit("")))
        return docs.select(
            F.col(id_col).alias("doc_id"), F.posexplode(kept).alias("pos", "term")
        )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(arr).alias("term")
    ).where(
        (F.length("term") >= max(1, cfg.min_token_len))
        & (F.length("term") <= cfg.max_token_len)
    )


def term_freqs_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(doc_id, term, tf) — the posting-emission input.

    tf is DOC-LOCAL (every token of a doc sits in that doc's input row),
    so the aggregate never needs the token rows shuffled: repartitioning
    the INPUT docs by doc_id gives the plan a hashpartitioning(doc_id)
    that satisfies the aggregate's (doc_id, term) clustering — the only
    exchange carries the ~KB text rows, not the ~100x token rows whose
    map-side partial agg could never collapse anything (each (doc, term)
    is already unique per task). Measured 3.26 s -> 0.45 s at 50k docs
    (guide §2.4: remove shuffles outright).
    """
    return (
        tokens_df(docs.repartition(id_col), text_col, id_col, cfg)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cfg: EngineConfig = _DEFAULT,
) -> DataFrame:
    """(doc_id, doc_len) — token count per doc; feeds BM25 length norm.

    Computed without a shuffle: size() of the token array per row.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_array(F.col(text_col), cfg)).alias("doc_len"),
    )


# ---------------------------------------------------------------- pure-Python twin


def tokenize_py(text: str, cfg: EngineConfig = _DEFAULT) -> list[str]:
    """Pure-Python tokenizer; must be byte-identical to tokens_array."""
    toks = re.split(cfg.token_split_re, text.lower())
    return [t for t in toks if cfg.min_token_len <= len(t) <= cfg.max_token_len]
