"""[EXT] Feature-engineering operators for training-data preparation.

The reference prepares model-ready corpora by hand (pandas column ops in
`build_master_corpus.py`, `co_pilot_summary.csv` feature columns); this
module provides the distributed, deterministic versions of the standard
feature steps a large-scale training pipeline runs after curation:

- **hash split** — assign train/val/test by a portable content hash, so
  the split is reproducible on any engine, partitioning, or cluster
  size, and never drifts when the corpus is re-ingested;
- **feature hashing** (the "hashing trick", Weinberger et al. 2009) —
  token -> fixed slot space via md5, emitted in long form (doc, slot,
  count): the distributed-friendly sparse representation (a wide dense
  vector column would defeat column pruning and explode shuffle width);
- **leave-one-out target encoding** — category -> mean of the target
  over *other* rows, the standard leakage-free categorical encoder;
  computed from one per-category (sum, count) aggregate joined back,
  so each row's own target subtracts out exactly.

Everything accumulates in integers (portable-exact); the only float ops
are final divisions of exact integers, identical on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.training import uniform_hash_u32

__all__ = ["split_assign", "feature_hash_long", "target_encode_loo"]


def split_assign(
    id_col: Column | str,
    *,
    train_pct: int = 80,
    val_pct: int = 10,
) -> Column:
    """Deterministic split label ('train'/'val'/'test') from the md5
    uniform of the id — integer threshold math, no float boundary."""
    bucket = uniform_hash_u32(F.col(id_col) if isinstance(id_col, str) else id_col) % 100
    return (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def feature_hash_long(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_slots: int = 64,
) -> DataFrame:
    """Hashing-trick features in long form: (id, slot, cnt) with
    ``slot = md5_u32(token) % n_slots`` and ``cnt`` the token count.

    Long form IS the scale design: the downstream consumer (a trainer's
    sparse matrix builder, a slot-level IDF weighting, a per-slot
    statistics pass) gets a shuffle keyed however it needs, while the
    wide-vector form would pin every doc's whole vector into one row.
    One explode + one map-side-combined groupBy; no joins.

    Tokenization splits on whitespace RUNS and drops empty tokens — a
    literal single-space split hashed phantom ''-tokens into a slot for
    empty docs and double spaces, corrupting the feature vectors.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("_tok"),
    ).filter(F.length("_tok") > 0)
    return (
        toks.select(
            "_id", (uniform_hash_u32(F.col("_tok")) % n_slots).alias("slot")
        )
        .groupBy("_id", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
) -> DataFrame:
    """Leave-one-out target encoding: for each row, the mean of
    ``target_col`` over the *other* rows of its category —
    ``(sum_cat - y) / (cnt_cat - 1)``, NULL for singleton categories.

    One groupBy for the per-category (sum, count) — a tiny frame at any
    scale (one row per category) — broadcast back onto the fact rows.
    The subtraction removes the row's own target exactly (integer
    sums), which is what makes the encoder leakage-free without any
    per-row re-aggregation.
    """
    # count the TARGET column, not rows: SUM skips NULL targets, so the
    # denominator must too — counting all rows made every LOO mean in a
    # category with NULL targets wrong (and a 2-row category with one
    # NULL produced 0.0 instead of NULL)
    agg = df.groupBy(category_col).agg(
        F.sum(F.col(target_col)).alias("_s"),
        F.count(F.col(target_col)).alias("_c"),
    )
    return (
        df.join(F.broadcast(agg), category_col)
        .withColumn(
            "loo_target_mean",
            F.round(
                (F.col("_s") - F.col(target_col)).cast("double")
                / F.nullif(F.col("_c") - 1, F.lit(0)).cast("double"),
                6,
            ),
        )
        .drop("_s", "_c")
    )
