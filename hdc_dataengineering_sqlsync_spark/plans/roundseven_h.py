"""SURVEY.md §2 round-7 batch H: audio spectral analysis and exact heavy
hitters.

  multimodal_audio_spectral_peak  rfft peak detection over real WAV bytes
  agg_heavy_hitters_exact         threshold-frequency census (not top-k)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdc_dataengineering_sqlsync_spark.plans.catalog import query, sort_reduction
from hdc_dataengineering_sqlsync_spark.registry import load

# --------------- 2.9 llm-data: audio spectral peak via numpy rfft

_SPECTRAL_SUBSET = "doc_id % 7 = 2"
_SR = 16000
_N = 2048  # samples per clip; bin width = SR/N = 7.8125 Hz

# tone bin is closed-form in doc_id and lands EXACTLY on an FFT bin
# (integer cycles per window), so |rfft| peaks at that bin with no
# leakage and the oracle needs no DSP — just the same arithmetic.
_SPECTRAL_ORACLE = f"""
SELECT doc_id AS media_id,
       CAST({_SR} AS INT) AS sample_rate,
       CAST({_N} AS INT) AS n_samples,
       CAST(16 + (doc_id % 40) * 7 AS INT) AS peak_bin,
       CAST((16 + (doc_id % 40) * 7) * {_SR} // {_N} AS BIGINT) AS est_freq_hz
FROM documents WHERE {_SPECTRAL_SUBSET} ORDER BY media_id
"""

_SPECTRAL_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)
_SPECTRAL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("peak_bin", T.IntegerType()),
        T.StructField("est_freq_hz", T.LongType()),
    ]
)


@query("multimodal_audio_spectral_peak", "2.9 llm-data", _SPECTRAL_ORACLE)
def multimodal_audio_spectral_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio SPECTRAL feature extraction, end-to-end: each media row
    synthesizes a REAL mono 16-bit PCM WAV (a pure tone whose frequency
    is closed-form in doc_id, chosen to land exactly on an FFT bin —
    integer cycles per window, zero leakage), and a second Arrow-batched
    mapInPandas stage parses the WAV bytes back and runs a REAL numpy
    rfft, reporting the argmax magnitude bin and its frequency. The
    oracle recomputes (peak_bin, est_freq_hz) from the closed form alone
    — a WAV container bug, a sample-scaling bug, or an FFT
    indexing/windowing bug all mismatch. This is the fingerprinting/
    language-ID-adjacent DSP step an audio corpus pipeline runs per clip
    (the WAV codec itself is pinned by multimodal_decode_audio).

    Scale shape: synth, parse, and FFT all inside ONE mapInPandas
    partition per batch — payloads never shuffle, only 5 slim feature
    columns leave the stage; FFT cost is O(N log N) per clip, data-size
    linear in clips."""
    import numpy as np
    import pandas as pd

    from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
        decode_wav,
        encode_wav,
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for m in pdf["doc_id"]:
                m = int(m)
                k = 16 + (m % 40) * 7  # exact-bin tone
                t = np.arange(_N, dtype=np.float64)
                samples = (12000 * np.sin(2 * np.pi * k * t / _N)).astype(np.int16)
                payloads.append(encode_wav(samples, _SR))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    def spectral(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, samples = decode_wav(bytes(payload))
                mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
                peak = int(np.argmax(mag))
                rows.append(
                    (int(mid), sr, len(samples), peak, peak * sr // len(samples))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _SPECTRAL_STATS_SCHEMA.fields]
            )

    docs = load(spark, sf_dir, "documents").where(_SPECTRAL_SUBSET)
    media = docs.select("doc_id").mapInPandas(synth, schema=_SPECTRAL_MEDIA_SCHEMA)
    return sort_reduction(media.mapInPandas(spectral, schema=_SPECTRAL_STATS_SCHEMA), "media_id")


# ----------------- 2.4 aggregations: exact heavy hitters by threshold

_HH_ORACLE = """
WITH cnt AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
t AS (SELECT sum(c) AS total, count(*) AS n_keys FROM cnt)
SELECT k AS partkey, CAST(c AS BIGINT) AS n_lines,
       CAST((c * 20000000 + t.total) // (2 * t.total) AS BIGINT) AS freq_ppm
FROM cnt, t
WHERE c * 2000 > t.total
ORDER BY n_lines DESC, partkey
"""


@query("agg_heavy_hitters_exact", "2.4 aggregations", _HH_ORACLE)
def agg_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters by FREQUENCY THRESHOLD (every part above 0.05%
    of lineitems) — the complement of top-k: the output size is
    data-dependent, the question is 'who crosses the line', and the
    threshold test is the integer cross-multiplication c·2000 > total (no
    float share can flap membership at the boundary). Frequency reported
    in half-up ppm. The exact ground truth a Misra-Gries / SpaceSaving
    sketch (whose distributed merge order makes its OUTPUT
    non-deterministic — why the sketch form is documented, not declared)
    would be validated against.

    Scale shape: ONE map-side-combinable keyed count + a broadcast total;
    the threshold filter runs on the reduced key table, never on raw
    rows."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    cnt = li.groupBy(F.col("l_partkey").alias("k")).agg(F.count(F.lit(1)).alias("c"))
    t = cnt.agg(F.sum("c").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(t))
        .where(F.col("c") * 2000 > F.col("total"))
        .select(
            F.col("k").alias("partkey"),
            F.col("c").alias("n_lines"),
            F.expr("cast((c * 20000000 + total) div (2 * total) as bigint)").alias(
                "freq_ppm"
            ),
        )
        .orderBy(F.desc("n_lines"), "partkey")
    )
