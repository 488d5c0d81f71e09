"""Canonical missing-value handling (SURVEY §1.2 'hard part' #2).

The reference splits missingness between ``NaN`` and ``""`` and re-tests
both at every call site (reference: legiscan_enricher.py:336,361-388,
legiscan_normalizer.py:325). The engine canonicalizes to NULL at ingest
(``schemas.conform``) and keeps one shared predicate for edge data that
hasn't been conformed yet.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_missing(col: Column | str) -> Column:
    """NULL, empty, whitespace-only, or the reference's 'not found'
    sentinel (legiscan_enricher.py:336) — one canonical missing test."""
    c = _c(col)
    return c.isNull() | (F.trim(c.cast("string")) == "") | (
        F.lower(F.trim(c.cast("string"))) == "not found"
    )


def nullify_blank(col: Column | str) -> Column:
    """Map ''/whitespace-only to NULL (ingest-time canonicalization)."""
    c = _c(col)
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def coalesce_missing(*cols: Column | str) -> Column:
    """``coalesce`` that treats ''/'not found' as missing too — the
    source-priority fallback idiom of the enricher
    (legiscan_enricher.py:361-388)."""
    out = F.lit(None)
    first = True
    for col in cols:
        c = _c(col)
        if first:
            out = F.when(~is_missing(c), c)
            first = False
        else:
            out = out.when(~is_missing(c), c)
    return out.otherwise(F.lit(None))
