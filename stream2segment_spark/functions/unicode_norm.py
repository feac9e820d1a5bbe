"""Unicode canonical normalization (NFC) for multilingual dedup.

The same visible text can arrive in composed (U+00E9) or decomposed
(U+0065 U+0301) form — different byte sequences, identical meaning.
The engine's default ASCII pipeline is immune (non-ASCII runs become
separators before any comparison), but every ``tokenizer='unicode'`` /
``'cjk'`` surface compares raw codepoints: an exact-dedup fingerprint,
a shingle, a BM25 term or an LM token over decomposed text will never
match its composed twin. Normalizing to NFC (UAX #15 canonical
composition) upstream closes that hole — the standard first step of
the published multilingual pipelines (CCNet, mC4) before any
cross-document comparison.

Spark has no built-in normalizer, so this is an Arrow-batched pandas
UDF over ``pandas.Series.str.normalize`` (Python ``unicodedata``,
which implements the same UAX #15 algorithm as DuckDB's utf8proc
``nfc_normalize`` — the oracle replay; three-way agreement is pinned
by tests). A map-only stage: no shuffle, safe at any scale; budget it
like the other Arrow stages (the engine's 55 vectorized-UDF stages are
the precedent — normalization is inherently per-codepoint work no
JVM built-in expresses).

No reference counterpart (seismic metadata is ASCII); beyond-reference
LLM-pipeline surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["normalize_nfc", "nfc_changed", "add_nfc_fingerprint"]


def normalize_nfc(col: Column | str) -> Column:
    """NFC-normalize a string column (nulls pass through)."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return _nfc(F.col(col) if isinstance(col, str) else col)


def nfc_changed(col: Column | str) -> Column:
    """True where NFC normalization altered the string (i.e. the text
    was not already in canonical composed form); null-safe false for
    null input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(normalize_nfc(c) != c, F.lit(False))


def add_nfc_fingerprint(df: DataFrame, text_col: str,
                        fp_col: str = "nfc_fp") -> DataFrame:
    """Append an md5 fingerprint of the NFC-normalized text — the
    normalization-insensitive exact-dedup key for unicode corpora
    (composed and decomposed twins collide here, never on a raw-text
    hash). Nulls fingerprint as the empty string, matching
    ``operators.dedup.doc_fingerprint``'s null convention."""
    nfc = normalize_nfc(F.coalesce(F.col(text_col), F.lit("")))
    return df.withColumn(fp_col, F.md5(nfc))
