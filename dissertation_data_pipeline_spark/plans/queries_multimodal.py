"""[EXT] Multimodal plumbing queries — oracle-checked.

The media payloads are synthesized from the ``documents`` table as
UTF-8 bytes of an (optionally ASCII-magic-prefixed) string, which makes
the *binary* pipeline value-checkable in DuckDB: the bytes Spark's
pandas UDF hashes are exactly the UTF-8 encoding of the string DuckDB's
``md5(VARCHAR)`` hashes, and the deterministic fake decoder derives all
features from that digest (operators/multimodal.py). Real deployments
swap the fake for PIL/ffmpeg decoders behind the same mapInPandas
signatures — the plumbing under test here is unchanged by that swap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators import multimodal as mm
from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table

#: byte k (0-based) of an md5 hex digest d, as DuckDB SQL
def _byte(k: int) -> str:
    return (
        f"((strpos('0123456789abcdef', substr(d, {2 * k + 1}, 1)) - 1) * 16"
        f" + strpos('0123456789abcdef', substr(d, {2 * k + 2}, 1)) - 1)"
    )


def _media(spark, sf_dir):
    """documents -> MEDIA_SCHEMA rows; even doc_ids carry a RIFF magic
    (ASCII, so blob bytes == UTF-8 of the string the oracle hashes)."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit("RIFF0000WAVE"), F.col("text"))
    ).otherwise(F.col("text"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(s, "UTF-8").alias("payload"),
        F.lit(None).cast("long").alias("n_bytes"),
    )


@register(
    "ext_multimodal_features",
    f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'RIFF0000WAVE' || text ELSE text END AS s
      FROM documents
    ), meta AS (
      SELECT media_id,
             octet_length(encode(s)) AS n_bytes,
             CASE WHEN substr(hex(encode(s)), 1, 8) = '52494646'
                   AND substr(hex(encode(s)), 17, 8) = '57415645'
                  THEN 'audio/wav' ELSE 'application/octet-stream'
             END AS sniffed_mime,
             md5(s) AS d
      FROM media
    )
    SELECT media_id, n_bytes, sniffed_mime,
           64 + {_byte(0)} % 192 AS width,
           64 + {_byte(1)} % 192 AS height,
           3 AS channels,
           {_byte(2)} / 256.0 AS mean_luma
    FROM meta
    """,
)
def ext_multimodal_features(spark, sf_dir):
    """Binary-column pipeline end-to-end: native metadata sniff (no
    byte-touching for filterable fields) joined with Arrow-batched
    pandas-UDF feature extraction over the payload bytes."""
    media = _media(spark, sf_dir)
    meta = mm.attach_metadata(media).select("media_id", "n_bytes", "sniffed_mime")
    feats = mm.extract_image_features(media)
    return meta.join(feats, "media_id").select(
        "media_id", "n_bytes", "sniffed_mime", "width", "height", "channels", "mean_luma"
    )


@register(
    "ext_multimodal_frame_sample",
    """
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'RIFF0000WAVE' || text ELSE text END AS s
      FROM documents
    )
    SELECT media_id, frame_idx, hex(encode(substr(s, frame_idx * 64 + 1, 64)))
             AS frame_hex
    FROM (
      SELECT media_id, s,
             CAST(unnest(range(0, CAST(ceil(length(s) / 64.0) AS BIGINT), 2))
                  AS INTEGER) AS frame_idx
      FROM media)
    """,
)
def ext_multimodal_frame_sample(spark, sf_dir):
    """1-to-many frame sampling plumbing (mapInPandas row explosion)
    with the deterministic 64-byte-chunk fake decoder, every_n=2.
    Payloads are ASCII-safe UTF-8, so byte offsets == char offsets and
    the oracle can slice the same frames with substr."""
    media = _media(spark, sf_dir).withColumn("kind", F.lit("video"))
    frames = mm.sample_video_frames(media, every_n=2, decoder=mm.fake_frame_decoder)
    # binary -> hex for the comparator (bytearray vs bytes canon)
    return frames.select("media_id", "frame_idx", F.hex("frame_png").alias("frame_hex"))


@register(
    "ext_multimodal_audio",
    """
    WITH params AS (
      SELECT doc_id AS media_id, 120 + doc_id % 37 AS n FROM documents
    ), samples AS (
      SELECT media_id, n, unnest(range(0, n)) AS i FROM params
    ), agg AS (
      SELECT media_id, n,
             CAST(SUM(((media_id * 31 + i * 7) % 256 - 128)
                      * ((media_id * 31 + i * 7) % 256 - 128)) AS BIGINT) AS ss
      FROM samples GROUP BY 1, 2
    )
    SELECT media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS channels,
           CAST(n AS BIGINT) AS n_samples,
           round(n / 8000.0, 6) AS duration_s,
           round(sqrt(ss / (16384.0 * n)), 6) AS rms
    FROM agg
    """,
)
def ext_multimodal_audio(spark, sf_dir):
    """REAL audio decode end-to-end, stdlib-only: per document a
    genuine mono PCM-8 WAV file is synthesized (RIFF container via the
    ``wave`` writer) from deterministic samples
    ``v(i) = (media_id*31 + i*7) % 256``, then parsed BACK by the
    ``wave``-module decoder, which emits rate/channels/length/RMS.
    The oracle recomputes the same features arithmetically — the WAV
    bytes round-trip is the part under test. RMS accumulates integer
    sums of squares; sqrt is IEEE-exact, so the value hash matches
    bit-for-bit."""
    from collections.abc import Iterator

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), (120 + F.col("doc_id") % 37).alias("n")
    )

    def synth(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                mid, n = int(r["media_id"]), int(r["n"])
                pcm = bytes((mid * 31 + i * 7) % 256 for i in range(n))
                rows.append(
                    dict(
                        media_id=mid,
                        kind="audio",
                        mime="audio/wav",
                        payload=mm.make_pcm8_wav(pcm),
                        n_bytes=None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "mime", "payload", "n_bytes"]
            )

    media = docs.mapInPandas(synth, mm.MEDIA_SCHEMA)
    feats = mm.extract_audio_features(media)  # real wave-module decode
    return feats.select(
        "media_id",
        "sample_rate",
        "channels",
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
    )
