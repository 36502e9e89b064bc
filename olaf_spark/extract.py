"""HTML -> text extraction.

Reference analogue: the ffmpeg decode step (`cli/olaf_cli_util_audio.zig:77-102`)
— the canonical "extraction" whose invariant is *same bytes in -> same bytes
out* for every url, at index time and query time alike.

Implemented three ways with byte-identical output (tested):
  * ``extract_text_py``     — pure-Python reference.
  * ``extract_text_udf``    — vectorized pandas UDF (Arrow batches; the
                              distributed path — no per-row Python in Spark).
  * ``extract_text_sql``    — the same transform as a DuckDB/Spark-SQL
                              expression string, for the driver oracle.

The extraction grammar is deliberately closed-form (regex on a controlled
HTML template, FIXTURES.md §1): strip <script>/<style> blocks, strip tags,
collapse whitespace runs to single spaces, trim. Pure string ops only — no
environment-dependent parser libs, so output is stable across workers.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SCRIPT_RE = re.compile(r"(?s)<(script|style)\b[^>]*>.*?</\1>")
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text_py(html: bytes | str) -> str:
    """Pure-Python extraction: the byte-identity reference."""
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _WS_RE.sub(" ", s)
    return s.strip()


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized extraction over Arrow batches (one Python call per batch)."""
    decoded = html.map(lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else b)
    out = (
        decoded.str.replace(_SCRIPT_RE, " ", regex=True)
        .str.replace(_TAG_RE, " ", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )
    return out


def extract_text_sql(html_expr: str, dialect: str = "duckdb") -> str:
    """Equivalent SQL expression.

    DuckDB's regexp_replace replaces only the first match unless passed the
    'g' flag; Spark SQL's replaces all and takes no flag argument — hence the
    dialect switch. Assumes ``html_expr`` is already a string (decode binary
    first).
    """
    g = ", 'g'" if dialect == "duckdb" else ""
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"{html_expr}, "
        f"'<(script|style)[^>]*>.*?</(script|style)>', ' '{g}), "
        f"'<[^>]*>', ' '{g}), "
        f"'\\s+', ' '{g}))"
    )
