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


#: the reference's 8 explicit formats (legiscan_normalizer.py:194-203),
#: as Spark datetime patterns, most-specific first.
DATE_FORMATS = [
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
    "MM-dd-yyyy",
    "MM/dd/yy",
    "MM-dd-yy",
    "MMMM d, yyyy",
    "MMM d, yyyy",
]


# F-d2 — legiscan_normalizer.py:172-216: multi-format parse with
# 2-digit-year -> 2000s promotion, NULL (not warning) on failure.
def parse_date_multi(col: Column | str) -> Column:
    c = F.trim(_c(col).cast("string"))
    c = F.when(c.rlike(r"^0000"), F.lit(None)).otherwise(c)  # 0000-00-00 guard
    parsed = F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)) for fmt in DATE_FORMATS])
    d = F.to_date(parsed)
    # Spark's yy pattern already maps 2-digit years to 2000-2099 range
    # per its pivot; make the reference's +2000 rule explicit anyway:
    return F.when(F.year(d) < 100, F.add_months(d, 12 * 2000)).otherwise(d)


# F-d3 — build_corpus.py:28-32: year by string slice. The reference
# returns 0 on failure; the engine returns NULL (documented deviation —
# 0 is not a year and poisons min/max aggregates).
def year_from_prefix(col: Column | str) -> Column:
    y = F.substring(F.trim(_c(col).cast("string")), 1, 4).try_cast("int")
    return F.when((y >= 1000) & (y <= 9999), y)
