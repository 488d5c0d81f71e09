"""Schema contracts + conform (SURVEY §1.3).

The reference infers input schemas (``pd.read_csv``) and then *forces*
fixed output contracts via explicit column lists, back-filling missing
columns with ``""`` (reference: ``legiscan_normalizer.py:47-56,255-258``,
``build_corpus.py:20-25,79-81``, ``normalize_corpus.py:44-61``,
``legiscan_collector.py:289-293``).

The engine makes the contracts first-class ``StructType`` objects and fixes
the reference's two pathologies (SURVEY §1.2):

- **One canonical missing value: NULL.** The reference splits missingness
  between ``NaN`` and ``""`` and tests both everywhere; ``conform`` (and
  the ``functions.is_missing`` predicate) normalize ``""``/whitespace-only
  strings to NULL at the contract boundary.
- **Typed nulls, not ``""`` back-fill.** Missing columns are added as
  NULL of the contract type (the reference's ``df[col] = ""`` loses
  type information and leaks ``""`` into joins/dedup keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Contracts (FIXTURES.md T1-T9; citations are into /root/reference/)
# ---------------------------------------------------------------------------

def _struct(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


#: T1 — collector output, one row per matched bill
#: (reference: legiscan_collector.py:289-293 CSV fieldnames; 214-226 row build)
BILLS_RAW = _struct(
    ("state", StringType()),
    ("bill_number", StringType()),
    ("title", StringType()),
    ("legiscan_bill_url", StringType()),
    ("legiscan_text_url", StringType()),
    ("status", StringType()),
    ("last_action_date", StringType()),
    ("matched_keywords", StringType()),
    ("search_method", StringType()),
    ("bill_text_html_file", StringType()),
    ("bill_text_txt_file", StringType()),
)

#: T2 — normalizer canonical schema (legiscan_normalizer.py:47-56 + Bill ID
#: at 343-358). Dates are DateType internally, ISO strings at the edges.
BILLS_COMBINED = _struct(
    ("state", StringType()),
    ("bill_number", StringType()),
    ("title", StringType()),
    ("legiscan_bill_url", StringType()),
    ("legiscan_text_url", StringType()),
    ("status", StringType()),
    ("last_action_date", DateType()),
    ("bill_id", StringType()),
)

#: T3 — merged master corpus (build_master_corpus.py:73-85,106-115).
#: ``year`` is IntegerType (nullable) — the reference's CSV round-trip
#: leaked it to double; that artifact is fixed, not reproduced.
MASTER_CORPUS = _struct(
    ("state", StringType()),
    ("state_abbrev", StringType()),
    ("bill_number", StringType()),
    ("title", StringType()),
    ("legiscan_bill_url", StringType()),
    ("legiscan_text_url", StringType()),
    ("year", IntegerType()),
    ("status", StringType()),
    ("collection_method", StringType()),
)

#: T4 — analysis-ready corpus (FINAL_COLUMNS, build_corpus.py:20-25)
CORPUS_FINAL = _struct(
    ("bill_id", StringType()),
    ("state", StringType()),
    ("year", IntegerType()),
    ("bill_number", StringType()),
    ("title", StringType()),
    ("status", StringType()),
    ("last_action_date", StringType()),
    ("matched_keywords", StringType()),
    ("search_method", StringType()),
    ("is_amendment", BooleanType()),
    ("text_source", StringType()),
    ("strikethrough_detected", BooleanType()),
    ("strikethrough_limitation_flag", BooleanType()),
    ("raw_word_count", IntegerType()),
    ("normalized_word_count", IntegerType()),
    ("raw_text", StringType()),
    ("normalized_text", StringType()),
)

#: T5 — normalization decisions log (DECISIONS_COLUMNS, normalize_corpus.py:44-61)
DECISIONS = _struct(
    ("bill_id", StringType()),
    ("state", StringType()),
    ("bill_number", StringType()),
    ("text_source", StringType()),
    ("is_amendment", BooleanType()),
    ("original_format", StringType()),
    ("strikethrough_detected", BooleanType()),
    ("strikethrough_chars_removed", IntegerType()),
    ("strikethrough_detection_method", StringType()),
    ("strikethrough_limitation_flag", BooleanType()),
    ("html_artifacts_removed", BooleanType()),
    ("raw_word_count", IntegerType()),
    ("normalized_word_count", IntegerType()),
    ("words_removed_pct", DoubleType()),
    ("normalization_timestamp", TimestampType()),
    ("notes", StringType()),
)

#: T7 — 51-row state dimension (build_master_corpus.py:27-40,
#: legiscan_collector.py:32-41). Broadcast-joined everywhere.
DIM_STATES = _struct(
    ("state_name", StringType()),
    ("state_abbrev", StringType()),
    ("state_id", IntegerType()),
)

#: T9 — state-year covariate panel (data/processed/state_covariates/README.md)
COVARIATES = _struct(
    ("state", StringType()),
    ("year", IntegerType()),
    ("gun_ownership", DoubleType()),
)

#: [EXT] documents table (TESTDATA.md) — the text-analysis substrate.
DOCUMENTS = _struct(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)


# ---------------------------------------------------------------------------
# conform
# ---------------------------------------------------------------------------

def conform(
    df: DataFrame,
    schema: StructType,
    *,
    blank_strings_to_null: bool = True,
    extra: str = "drop",
) -> DataFrame:
    """Project ``df`` onto ``schema``: add missing columns as typed NULLs,
    cast present ones, order columns, and (optionally) canonicalize
    whitespace-only strings to NULL.

    Replaces the reference's ``df[col] = ""`` back-fill
    (legiscan_normalizer.py:255-258, build_corpus.py:79-81) with typed
    NULLs, and its per-call-site two-valued missing checks with a single
    canonical representation.

    ``extra='keep'`` appends non-contract columns after the contract
    (useful mid-pipeline); ``'drop'`` (default) enforces the contract
    exactly; ``'error'`` raises.
    """
    have = {c.lower(): c for c in df.columns}
    cols = []
    for field in schema.fields:
        src = have.get(field.name.lower())
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            # try_cast: coerce semantics (NULL on malformed), matching the
            # reference's errors='coerce' posture at every ingest edge
            c = F.col(src).try_cast(field.dataType)
            if blank_strings_to_null and isinstance(field.dataType, StringType):
                c = F.when(F.trim(c) == "", F.lit(None)).otherwise(c)
            cols.append(c.alias(field.name))
    contract_names = {f.name.lower() for f in schema.fields}
    extras = [c for c in df.columns if c.lower() not in contract_names]
    if extras and extra == "error":
        raise ValueError(f"unexpected columns: {extras}")
    if extras and extra == "keep":
        cols += [F.col(c) for c in extras]
    return df.select(*cols)


def fuzzy_rename(df: DataFrame, aliases: dict[str, list[str]]) -> DataFrame:
    """Driver-side fuzzy column mapping (reference:
    legiscan_normalizer.py:59-101): map messy source headers onto contract
    names, case/whitespace-insensitively, exact-match first then substring.

    ``aliases`` maps contract name -> candidate patterns (lowercase).
    Unmatched contract names are left absent (conform adds them as NULL).
    This is schema-level (driver) logic, not a data-plane operator — the
    resulting plan is a plain ``select`` that Catalyst prunes through.

    Matching runs in two GLOBAL phases: every target's exact matches
    first, then substring fallbacks — so one target's fuzzy guess can
    never steal a column another target matches exactly (a first-
    target substring hit used to shadow a later target's exact alias).
    Substring fallback requires patterns of >= 4 normalized chars: a
    2-char alias like ``st`` is a substring of half the header space
    ('Last Date', 'Bill Status', ...) and greedy-matched garbage.
    """
    def norm(name: str) -> str:
        return " ".join(name.lower().split())

    available = {norm(c): c for c in df.columns}
    taken: set[str] = set()
    mapping: dict[str, str] = {}  # source col -> contract name
    # phase 1: exact normalized matches for EVERY target
    for target, patterns in aliases.items():
        for p in [target] + list(patterns):
            p = norm(p)
            if p in available and available[p] not in taken:
                taken.add(available[p])
                mapping[available[p]] = target
                break
    # phase 2: substring fallback for still-unmatched targets
    for target, patterns in aliases.items():
        if target in mapping.values():
            continue
        hit = None
        for p in [target] + list(patterns):
            p = norm(p)
            if len(p) < 4:
                continue  # too short to be a safe substring probe
            for k, orig in available.items():
                if orig not in taken and (p in k or k in p):
                    hit = orig
                    break
            if hit:
                break
        if hit is not None:
            taken.add(hit)
            mapping[hit] = target
    return df.select(
        *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
    )
