"""[EXT] Grouped-aggregate pandas UDAF surface (SURVEY §2.10).

The engine's UDF story covers scalar/iterator pandas UDFs
(``operators/text_udf.py``), ``mapInPandas`` batch transforms
(``operators/multimodal.py``), ``applyInPandasWithState`` streaming
state (``streaming/stateful.py``), and a Python UDTF
(``operators/udtfs.py``). This module adds the remaining surface: a
**GROUPED_AGG pandas UDF** — Arrow-batched custom aggregation usable
inside ``groupBy().agg(...)``.

The demonstrator is a per-group coordinate-wise median over an
embedding column: a genuinely non-built-in aggregate (Spark has no
array-typed median), order-statistic-based so it is deterministic
under any row order, and exactly reproducible by the DuckDB oracle
(both engines sort float64 values and average the middle two).

Scale note: a GROUPED_AGG pandas UDF materializes each group on one
executor (no partial aggregation) — correct here because groups are
label-sized cohorts of small vectors, and that bound is the operator's
contract. For algebraic aggregates (sum/mean/moments) use built-ins or
the moment-sketch pattern (``plans/queries_features.py::ext_corr_matrix``)
which keep map-side combine; reserve pandas UDAFs for genuinely
holistic statistics like this one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dim_medians_udaf():
    """Build the GROUPED_AGG UDAF lazily: ``pandas_udf`` parses its DDL
    return type against the active session, so decorating at module
    import would require a SparkContext before the engine creates one.

    The inner function widens float32 inputs to float64 BEFORE the
    median so the middle-pair average matches the oracle's DOUBLE
    arithmetic bit-for-bit (np.median sorts, so row order is
    irrelevant)."""

    @pandas_udf("array<double>")
    def dim_medians(vecs: pd.Series) -> list[float]:
        # NULL embeddings are excluded (SQL aggregate convention —
        # same as the sibling operators); a ragged group would
        # otherwise surface as an opaque vstack broadcast error, so
        # name the defect explicitly instead.
        vecs = vecs.dropna()
        if len(vecs) == 0:
            return []
        if len({len(v) for v in vecs}) > 1:
            raise ValueError(
                "label_dim_medians: ragged embedding lengths within a "
                f"group (saw lengths {sorted({len(v) for v in vecs})}); "
                "embeddings must share one dimensionality"
            )
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        return np.median(mat, axis=0).tolist()

    return dim_medians


def label_dim_medians(
    embeddings: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Per-label coordinate-wise embedding medians, long form.

    Output ``(label, dim, med)`` with 1-based ``dim`` — exploded to
    scalars so the result is canonicalizer-friendly (array-typed output
    columns are a correctness-gate hazard; see VERDICT round 1)."""
    agg = embeddings.groupBy(label_col).agg(
        _dim_medians_udaf()(F.col(vec_col)).alias("_med")
    )
    return agg.select(
        label_col, F.posexplode("_med").alias("_pos", "_v")
    ).select(
        F.col(label_col),
        (F.col("_pos") + 1).cast("long").alias("dim"),
        F.round("_v", decimals).alias("med"),
    )
