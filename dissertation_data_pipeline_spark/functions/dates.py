"""Date scalar functions (SURVEY §2.8 F-d1..F-d3).

The reference parses dates leniently (``pd.to_datetime(errors='coerce')``)
and with an 8-format fallback chain; both are pure built-in compositions
here (NULL on failure — never an exception, never a 0 sentinel).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# F-d1 — build_master_corpus.py:69,102: lenient parse -> year (NULL on fail)
def lenient_year(col: Column | str) -> Column:
    return F.year(parse_date_multi(col))


#: the reference's 8 explicit formats (legiscan_normalizer.py:194-203)
#: as Spark datetime patterns, most-specific first; 4-digit-year
#: formats separated from 2-digit ones so the century pivot can be
#: applied ONLY where a 2-digit year was actually parsed.
DATE_FORMATS_Y4 = [
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
    "MM-dd-yyyy",
    "MMMM d, yyyy",
    "MMM d, yyyy",
]
DATE_FORMATS_Y2 = ["MM/dd/yy", "MM-dd-yy"]
DATE_FORMATS = DATE_FORMATS_Y4 + DATE_FORMATS_Y2  # documented full chain


# F-d2 — legiscan_normalizer.py:172-216: multi-format parse, NULL (not
# warning) on failure.
def parse_date_multi(col: Column | str) -> Column:
    """Two-digit years replicate the reference's ``strptime %y`` pivot:
    00-68 -> 2000-2068, 69-99 -> 1969-1999 (the reference's explicit
    ``year < 100 -> +2000`` branch is dead code — strptime never yields
    year < 100). Spark's ``yy`` maps everything to 2000-2099, so parses
    landing in 2069-2099 through a 2-digit format shift back a century;
    a genuine 4-digit 2099 arrives via the y4 formats and is untouched.
    """
    c = F.trim(_c(col).cast("string"))
    c = F.when(c.rlike(r"^0000"), F.lit(None)).otherwise(c)  # 0000-00-00 guard
    d4 = F.to_date(
        F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in DATE_FORMATS_Y4])
    )
    d2 = F.to_date(
        F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in DATE_FORMATS_Y2])
    )
    d2 = F.when(F.year(d2) >= 2069, F.add_months(d2, -1200)).otherwise(d2)
    return F.coalesce(d4, d2)


# F-d3 — build_corpus.py:28-32: year by string slice. The reference
# returns 0 on failure; the engine returns NULL (documented deviation —
# 0 is not a year and poisons min/max aggregates).
def year_from_prefix(col: Column | str) -> Column:
    y = F.substring(F.trim(_c(col).cast("string")), 1, 4).try_cast("int")
    return F.when((y >= 1000) & (y <= 9999), y)
