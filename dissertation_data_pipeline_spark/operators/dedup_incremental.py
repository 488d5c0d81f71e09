"""[EXT] Incremental near-duplicate dedup: probe new batches against a
persisted LSH index instead of re-deduplicating the corpus.

At 100 TB the corpus-wide near-dup pass is a once-per-rebuild cost; the
operational question is the DAILY one — "this new crawl slice: which
docs are near-dups of anything we already hold?" Re-running the full
pairwise pass per increment is O(corpus) per day; probing a stored
band index is O(batch). This module is that probe:

- the index is the ``minhash_band_entries`` long form
  (doc_id, band_idx, band_key) — exactly what the batch LSH already
  computes, persisted instead of discarded. Write it bucketed/
  partitioned by the band key and the daily probe join is co-located
  (``sources.bucketing``);
- a new batch computes its own band entries (O(batch) work), joins the
  index on (band_idx, band_key) for candidates — same recall contract
  as batch LSH for the same band geometry — and survivors' entries are
  appended to the index for the next increment;
- within-batch duplicates resolve by the batch's own band self-join,
  keeping the min id per duplicate family (the same canonical-id rule
  as ``exact_dedup_groups``).

The reference's incremental analog is its processed-set skip
(utils.py:14-53) — membership-by-key; this is membership-by-content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.dedup_ext import (
    minhash_auto_banding,
    minhash_band_entries,
    minhash_signature_frame,
    shingle_postings,
)

__all__ = ["batch_band_entries", "dedup_incremental"]


def batch_band_entries(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 12,
    bands: int | None = None,
    threshold: float = 0.5,
    shingle_words: int = 3,
) -> DataFrame:
    """Band-index rows (_id, band_idx, band_key) for a batch — the unit
    both the stored index and the probe side are made of.

    ``bands=None`` derives the banding from ``threshold`` via
    ``minhash_auto_banding`` (candidate = any shared band, so the
    threshold expresses the Jaccard level the index must recall at).
    The probe side MUST use the same (num_hashes, bands) the stored
    index was built with — band keys are banding-specific."""
    if bands is None:
        bands, rows_per_band = minhash_auto_banding(num_hashes, threshold)
    else:
        rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes, "bands must divide num_hashes"
    post = shingle_postings(df, id_col, text_col, n=shingle_words)
    sig = minhash_signature_frame(post, num_hashes=num_hashes)
    return minhash_band_entries(sig, bands=bands, rows_per_band=rows_per_band)


def dedup_incremental(
    batch: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 12,
    bands: int | None = None,
    threshold: float = 0.5,
    shingle_words: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Dedup ``batch`` against the persisted band ``index`` (and within
    itself). Returns ``(survivors, new_index)``:

    - ``survivors``: batch rows that are NOT near-dup candidates of any
      indexed doc, keeping the min-id representative of each
      within-batch candidate family;
    - ``new_index``: the index plus the survivors' band entries — feed
      it to the next increment (or upsert into the backing store).

    Candidate = any shared (band_idx, band_key) — identical recall
    geometry to the batch LSH for the same parameters; callers needing
    the verified-Jaccard filter can join survivors' candidates back
    through the postings exactly as ``minhash_lsh_pairs`` does. The
    probe is two semi/anti joins on the band key: O(batch) rows moved,
    the index side pre-bucketed — nothing reads corpus text again.
    """
    be = batch_band_entries(
        batch,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        shingle_words=shingle_words,
    ).localCheckpoint(eager=False)

    # vs-corpus: any band collision with the index disqualifies
    vs_corpus_dup = (
        be.join(index, ["band_idx", "band_key"], "left_semi")
        .select("_id")
        .distinct()
    )
    # within-batch: min id per band bucket survives; a doc is a dup if
    # any of its bands has a smaller-id sharer
    bucket_min = be.groupBy("band_idx", "band_key").agg(
        F.min("_id").alias("_min_id")
    )
    within_dup = (
        be.join(bucket_min, ["band_idx", "band_key"])
        .filter(F.col("_id") > F.col("_min_id"))
        .select("_id")
        .distinct()
    )
    dropped = vs_corpus_dup.union(within_dup).distinct()
    survivors = batch.join(
        dropped.withColumnRenamed("_id", id_col), id_col, "left_anti"
    )
    surviving_entries = be.join(
        dropped, be["_id"] == dropped["_id"], "left_anti"
    )
    return survivors, index.unionByName(surviving_entries)
