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


#: the reference's 8 explicit strptime formats
#: (legiscan_normalizer.py:194-203) as LENIENT Spark patterns —
#: strptime %m/%d accept 1-2 digits, so 'M'/'d' (strict 'MM'/'dd'
#: silently NULLed '1/15/2020'); %Y requires 4 digits ('yyyy'); %y
#: takes 1-2 digits with the 1969/2068 century pivot. Month names
#: (%B/%b) match case-insensitively in strptime, so those formats
#: parse a title-cased copy of the input.
DATE_FORMATS_Y4 = [
    "yyyy-M-d",
    "M/d/yyyy",
    "yyyy/M/d",
    "M-d-yyyy",
    "MMMM d, yyyy",
    "MMM d, yyyy",
]
DATE_FORMATS_Y2 = ["M/d/yy", "M-d-yy"]  # %y: exactly 2 digits
DATE_FORMATS = DATE_FORMATS_Y4 + DATE_FORMATS_Y2  # documented chain


# F-d2 — legiscan_normalizer.py:172-216 (parse_date): multi-format
# parse, NULL (not warning) on failure.
def parse_date_multi(col: Column | str) -> Column:
    """Two-digit years replicate ``strptime %y``: 00-68 -> 2000-2068,
    69-99 -> 1969-1999 ('01/15/99' -> 1999, reference-verified — the
    reference's explicit ``year < 100 -> +2000`` branch is dead code
    because %Y demands 4 digits and %y never yields year < 100).
    Spark's ``yy`` maps everything to 2000-2099, so 2-digit parses
    landing in 2069-2099 shift back a century ('1/2/3' and '1/2/203'
    stay NULL — %y takes exactly two digits, parity-tested)."""
    c = F.trim(_c(col).cast("string"))
    c = F.when(c.rlike(r"^0000"), F.lit(None)).otherwise(c)  # 0000-00-00 guard
    tc = F.initcap(F.lower(c))  # %B/%b are case-insensitive
    d4 = F.to_date(
        F.coalesce(
            *[
                F.try_to_timestamp(tc if "MMM" in fmt else c, F.lit(fmt))
                for fmt in DATE_FORMATS_Y4
            ]
        )
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
