"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All JVM-side DataFrame expressions (no Python in the hot path), each with a
portable-SQL twin for the DuckDB oracle. Hashes are md5; ratios are rounded
to 6 dp for cross-engine hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olaf_spark.config import TOKEN_SPLIT_RE, EngineConfig
from olaf_spark.tokenize import tokens_array

_DEFAULT = EngineConfig()

# tiny deterministic stopword lexicons (n-gram heuristic style); the
# classifier is argmax of lexicon-hit ratio — deterministic and portable.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
}

STOPWORDS = LANG_LEXICONS["en"]

# "BPE-ish" regex: word pieces OR single non-space symbols — the same
# pattern string runs in Spark SQL and DuckDB regexp_extract_all.
BPE_ISH_RE = "[a-z0-9]+|[^a-z0-9\\s]"


def _hit_count(toks, lexicon: tuple[str, ...]):
    arr = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               cfg: EngineConfig = _DEFAULT) -> DataFrame:
    """(doc_id, lang_pred, lang_score) — argmax lexicon-hit ratio.

    Ties broken by language code ascending (deterministic).
    """
    toks = tokens_array(F.col(text_col), cfg)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    scored = base.select(
        "doc_id",
        *[
            F.round(
                _hit_count(F.col("toks"), lex) / F.greatest(F.size("toks"), F.lit(1)), 6
            ).alias(f"score_{lang}")
            for lang, lex in sorted(LANG_LEXICONS.items())
        ],
    )
    langs = sorted(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.select(
        "doc_id", pred.alias("lang_pred"), best.cast("double").alias("lang_score")
    )


def lang_id_sql() -> str:
    langs = sorted(LANG_LEXICONS)
    score_cols = []
    for lang in langs:
        lex = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
        score_cols.append(
            f"round(len(list_filter(toks, t -> list_contains([{lex}], t)))"
            f" / greatest(len(toks), 1), 6) AS score_{lang}"
        )
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '' AND len(t) <= 64) AS toks
  FROM documents
), scored AS (
  SELECT doc_id, {", ".join(score_cols)} FROM base
)
SELECT doc_id, {pred} AS lang_pred, ({best})::DOUBLE AS lang_score FROM scored
"""


def quality_score_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                     cfg: EngineConfig = _DEFAULT) -> DataFrame:
    """(doc_id, n_tokens, distinct_ratio, stopword_ratio, alpha_ratio, quality).

    quality = 0.4*stopword-presence + 0.3*distinct ratio + 0.3*alpha ratio —
    the length/punct/stopword heuristic family used by corpus filters.
    """
    toks = tokens_array(F.col(text_col), cfg)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"), F.col(text_col).alias("_t"))
    n = F.greatest(F.size("toks"), F.lit(1))
    stop_ratio = F.round(_hit_count(F.col("toks"), STOPWORDS) / n, 6)
    distinct_ratio = F.round(F.size(F.array_distinct("toks")) / n, 6)
    alpha = F.length(F.regexp_replace(F.lower("_t"), "[^a-z]", ""))
    alpha_ratio = F.round(alpha / F.greatest(F.length("_t"), F.lit(1)), 6)
    # floor(x*1e6+0.5)/1e6 instead of round(): the composite lands exactly on
    # .5 rounding boundaries (inputs are 6dp-rounded), where Spark's HALF_UP
    # and DuckDB's rounding of the underlying double disagree; floor on the
    # identical double is deterministic in both engines.
    raw_q = (
        F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * alpha_ratio
    )
    quality = F.floor(raw_q * 1_000_000 + F.lit(0.5)) / F.lit(1_000_000.0)
    return base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        distinct_ratio.cast("double").alias("distinct_ratio"),
        stop_ratio.cast("double").alias("stopword_ratio"),
        alpha_ratio.cast("double").alias("alpha_ratio"),
        quality.cast("double").alias("quality"),
    )


def quality_score_sql() -> str:
    lex = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '' AND len(t) <= 64) AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_tokens,
         round(len(list_distinct(toks)) / greatest(len(toks), 1), 6) AS distinct_ratio,
         round(len(list_filter(toks, t -> list_contains([{lex}], t)))
               / greatest(len(toks), 1), 6) AS stopword_ratio,
         round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
               / greatest(length(text), 1), 6) AS alpha_ratio
  FROM base
)
SELECT doc_id, n_tokens,
       distinct_ratio::DOUBLE AS distinct_ratio,
       stopword_ratio::DOUBLE AS stopword_ratio,
       alpha_ratio::DOUBLE AS alpha_ratio,
       (floor((0.4::DOUBLE * least(stopword_ratio * 5, 1.0)
               + 0.3::DOUBLE * distinct_ratio
               + 0.3::DOUBLE * alpha_ratio) * 1000000 + 0.5) / 1000000.0)::DOUBLE AS quality
FROM m
"""


def token_count_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens) — whitespace + regex token counts."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.trim(F.col(text_col)), "\\s+")).cast("long").alias("ws_tokens"),
        # F.lit for the pattern — embedding it in an F.expr SQL string would
        # escape-process the backslash ('\s' -> 's') and corrupt the class
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_RE), F.lit(0)))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


def token_count_sql() -> str:
    return f"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_ISH_RE}'))::BIGINT AS bpe_ish_tokens
FROM documents
"""


def doc_fingerprint_df(docs: DataFrame, k: int = 4, shingle_chars: int = 8,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint) — min-k-of-md5 over character shingles.

    Rolling-hash-family fingerprint: slide a `shingle_chars` window over the
    whitespace-normalized text, hash each window, keep the k smallest hashes,
    join sorted. Deterministic; near-identical docs share most of the min-k.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    base = docs.select(F.col(id_col).alias("doc_id"), norm.alias("nt"))
    hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("nt") - shingle_chars + 1, F.lit(1))),
        lambda i: F.md5(F.col("nt").substr(i, F.lit(shingle_chars))),
    )
    mink = F.slice(F.array_sort(F.array_distinct(hashes)), 1, k)
    return base.select("doc_id", F.array_join(mink, ",").alias("fingerprint"))


def doc_fingerprint_sql(k: int = 4, shingle_chars: int = 8) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS nt
  FROM documents
), sh AS (
  SELECT doc_id, md5(substr(nt, i, {shingle_chars})) AS h
  FROM (
    SELECT doc_id, nt,
           unnest(generate_series(1, greatest(length(nt) - {shingle_chars} + 1, 1))) AS i
    FROM base
  )
), ranked AS (
  SELECT doc_id, h,
         row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
  FROM (SELECT DISTINCT doc_id, h FROM sh)
)
SELECT doc_id, string_agg(h, ',' ORDER BY h) AS fingerprint
FROM ranked WHERE rn <= {k}
GROUP BY doc_id
"""
