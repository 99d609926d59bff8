"""Round-7 unit tests: RLE8 BMP codec edge cases (the declared qid
multimodal_decode_bmp_rle covers the end-to-end path; these pin the codec
corners the fixture's closed-form images never hit)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hdc_dataengineering_sqlsync_spark.operators.media_codecs import (
    decode_bmp,
    encode_bmp,
    encode_bmp_rle8,
)

_PAL = np.stack(
    [(np.arange(256) * 11) % 256, (np.arange(256) * 23) % 256, (np.arange(256) * 37) % 256],
    axis=1,
).astype(np.uint8)


def _rle_payload(w: int, h: int, data: bytes) -> bytes:
    """Hand-build an RLE8 BMP container around raw RLE bytes."""
    palq = np.zeros((256, 4), dtype=np.uint8)
    palq[:, 0], palq[:, 1], palq[:, 2] = _PAL[:, 2], _PAL[:, 1], _PAL[:, 0]
    offset = 54 + 1024
    hdr = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data), 2835, 2835, 256, 0)
    return hdr + info + palq.tobytes() + data


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 13),
    w=st.integers(1, 300),
    seed=st.integers(0, 2**31 - 1),
)
def test_rle8_roundtrip(h, w, seed):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    idx[:, : w // 2] = idx[:, :1]  # force some real runs
    out = decode_bmp(encode_bmp_rle8(idx, _PAL))
    assert out.shape == (h, w, 3)
    assert (out == _PAL[idx]).all()


def test_rle8_run_longer_than_255_splits():
    idx = np.zeros((1, 600), dtype=np.uint8) + 7
    payload = encode_bmp_rle8(idx, _PAL)
    # 600 = 255 + 255 + 90 -> three run pairs + EOL + EOB
    data = payload[54 + 1024 :]
    assert data == bytes([255, 7, 255, 7, 90, 7]) + b"\x00\x00" + b"\x00\x01"
    assert (decode_bmp(payload) == _PAL[idx]).all()


def test_rle8_absolute_mode_even_and_odd():
    # absolute runs are word-aligned: odd counts carry one pad byte
    data = bytes([0, 4, 1, 2, 3, 4]) + b"\x00\x00" + b"\x00\x01"
    out = decode_bmp(_rle_payload(4, 1, data))
    assert (out[0] == _PAL[[1, 2, 3, 4]]).all()
    data = bytes([0, 3, 5, 6, 7, 0]) + bytes([2, 9]) + b"\x00\x00" + b"\x00\x01"
    out = decode_bmp(_rle_payload(5, 1, data))
    assert (out[0] == _PAL[[5, 6, 7, 9, 9]]).all()


def test_rle8_delta_escape_rejected():
    data = bytes([0, 2, 1, 1]) + b"\x00\x01"
    with pytest.raises(ValueError, match="delta"):
        decode_bmp(_rle_payload(4, 2, data))


def test_rle8_bottom_up_row_order():
    idx = np.array([[1, 1], [2, 2]], dtype=np.uint8)
    payload = encode_bmp_rle8(idx, _PAL)
    data = payload[54 + 1024 :]
    # bottom row (2s) must be emitted FIRST
    assert data.startswith(bytes([2, 2]))
    assert (decode_bmp(payload) == _PAL[idx]).all()


def test_uncompressed_bmp_still_decodes():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert (decode_bmp(encode_bmp(px)) == px).all()


# ---------------- mutual-kNN block census vs a pure-Python reference

def _mknn_reference(ids, vecs, k=3):
    """Brute-force reference: top-k by (dot DESC, id ASC), mutual census."""
    n = len(ids)
    knn = {}
    for i in range(n):
        scored = sorted(
            ((-sum(a * b for a, b in zip(vecs[i], vecs[j])), ids[j]) for j in range(n) if j != i)
        )[: min(k, n - 1)]
        knn[ids[i]] = {jid for _, jid in scored}
    directed = sum(len(v) for v in knn.values())
    mutual = sum(
        1
        for a in knn
        for b in knn[a]
        if a < b and a in knn.get(b, ())
    )
    return len(ids), directed, mutual


@settings(max_examples=20, deadline=None)
@given(n=st.integers(2, 12), seed=st.integers(0, 10**6))
def test_mutual_knn_census_matches_reference(n, seed):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    ids = sorted(rng.choice(10**6, size=n, replace=False).tolist())
    vecs = rng.integers(-5, 6, (n, 8)).astype("int64")
    # force tie potential: duplicate one vector when n allows
    if n >= 4:
        vecs[1] = vecs[0]
    pdf = pd.DataFrame({"label": [7] * n, "vec_id": ids, "qn": [v.tolist() for v in vecs]})
    # mirror the qid's numpy census steps exactly (the closure itself is
    # only reachable through applyInPandas)
    pdf = pdf.sort_values("vec_id")
    qm = np.array(pdf["qn"].tolist(), dtype=np.int64)
    dots = qm @ qm.T
    np.fill_diagonal(dots, -(1 << 62))
    k = min(3, n - 1)
    order = np.argsort(-dots, axis=1, kind="stable")[:, :k]
    adj = np.zeros((n, n), dtype=bool)
    adj[np.repeat(np.arange(n), k), order.ravel()] = True
    mutual = adj & adj.T
    got = (n, n * k, int(np.triu(mutual, 1).sum()))
    assert got == _mknn_reference(ids, [v.tolist() for v in vecs], 3)


# ---------------- substring coverage vs a brute-force reference

def _coverage_reference(texts, k=8):
    """Brute-force ExactSubstr coverage: duplicated windows mark positions."""
    from collections import Counter

    wins = Counter()
    for t in texts:
        tok = t.split(" ")
        for i in range(len(tok) - k + 1):
            wins[" ".join(tok[i : i + k])] += 1
    covered = []
    for t in texts:
        tok = t.split(" ")
        cov = set()
        for i in range(len(tok) - k + 1):
            if wins[" ".join(tok[i : i + k])] >= 2:
                cov.update(range(i, i + k))
        covered.append((len(tok), len(cov)))
    return covered


def test_substring_coverage_matches_reference(spark):
    from pyspark.sql import functions as F

    texts = [
        "a b c d e f g h i j",          # shares the 8-window with doc 1
        "a b c d e f g h x y",          # overlap on first 8 tokens
        "z z z z z z z z z z z z",      # self-repeated window
        "short doc",                     # < 8 tokens, never covered
        "p q r s t u v w",              # unique exact-8 window
    ]
    ref = _coverage_reference(texts)
    df = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)], "doc_id long, text string, lang string"
    )
    # replicate the qid's per-doc coverage legs directly
    t = F.split(F.col("text"), " ")
    toks = df.select("doc_id", t.alias("t"), F.size(t).alias("n"))
    win = toks.where(F.col("n") >= 8).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 7),
                lambda s: F.struct(
                    s.cast("long").alias("s"),
                    F.array_join(F.slice(F.col("t"), s, 8), " ").alias("w"),
                ),
            )
        ).alias("sw"),
    ).select("doc_id", F.col("sw.s").alias("s"), F.col("sw.w").alias("w"))
    dup = win.groupBy("w").count().where("count >= 2").select("w")
    cov = (
        win.join(dup, "w")
        .select("doc_id", F.explode(F.sequence(F.col("s"), F.col("s") + 7)).alias("pos"))
        .distinct()
        .groupBy("doc_id")
        .count()
    )
    got = {r["doc_id"]: r["count"] for r in cov.collect()}
    for i, (n_tok, n_cov) in enumerate(ref):
        assert got.get(i, 0) == n_cov, f"doc {i}: got {got.get(i, 0)}, want {n_cov}"


# ---------------- MMR greedy vs a pure-Python reference

def test_mmr_rerank_matches_reference(spark, sf_dir, oracle):
    """The declared qid already oracle-matches; this pins the GREEDY
    SEMANTICS against an independent reference implementation reading the
    same pool, so a future unroll bug can't pass by both sides drifting
    together."""
    from hdc_dataengineering_sqlsync_spark.plans.roundseven_j import simsearch_mmr_rerank

    rows = simsearch_mmr_rerank(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]

    # reference: rebuild pool + greedy in python from the duckdb grid
    qn = dict(
        oracle.execute(
            """
            SELECT vec_id, list_transform(q, v -> CAST(floor(v * 10000 / sqrt(nn2) + 0.5) AS BIGINT)) AS qn
            FROM (SELECT vec_id,
                         list_transform(range(1,65), i -> CAST(round(embedding[i]*1000) AS BIGINT)) AS q,
                         list_sum(list_transform(range(1,65), i ->
                           CAST(round(embedding[i]*1000) AS BIGINT) * CAST(round(embedding[i]*1000) AS BIGINT))) AS nn2
                  FROM embeddings) WHERE nn2 > 0
            """
        ).fetchall()
    )
    qx = qn[0]
    rel = {
        v: sum(a * b for a, b in zip(vec, qx)) for v, vec in qn.items() if v != 0
    }
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:10]
    picked = [min(pool, key=lambda v: (-rel[v], v))]
    while len(picked) < 3:
        cand = [v for v in pool if v not in picked]
        score = {
            v: 2 * rel[v]
            - max(sum(a * b for a, b in zip(qn[v], qn[p])) for p in picked)
            for v in cand
        }
        picked.append(min(cand, key=lambda v: (-score[v], v)))
    assert [r["vec_id"] for r in rows] == picked


# ---------------- r13 rewrite: single-construction window count + interval merge


def test_substring_coverage_interval_merge_matches_reference(spark):
    """The r13 coverage legs (count-over-window dup mark + sorted-start
    interval merge) against the pure-Python position-set reference, on the
    same adversarial texts as the census-join test above (overlapping dup
    windows, self-repeated runs, sub-K docs)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    texts = [
        "a b c d e f g h i j",
        "a b c d e f g h x y",
        "z z z z z z z z z z z z",
        "short doc",
        "p q r s t u v w",
    ]
    ref = _coverage_reference(texts)
    df = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)], "doc_id long, text string, lang string"
    )
    t = F.split(F.col("text"), " ")
    toks = df.select("doc_id", t.alias("t"), F.size(t).alias("n"))
    win = toks.where(F.col("n") >= 8).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - 7),
                lambda s: F.struct(
                    s.cast("long").alias("s"),
                    F.array_join(F.slice(F.col("t"), s, 8), " ").alias("w"),
                ),
            )
        ).alias("sw"),
    ).select("doc_id", F.col("sw.s").alias("s"), F.col("sw.w").alias("w"))
    occ = (
        win.withColumn("_nw", F.count(F.lit(1)).over(Window.partitionBy("w")))
        .where(F.col("_nw") >= 2)
        .select("doc_id", "s")
    )
    ws = Window.partitionBy("doc_id").orderBy("s")
    cov = (
        occ.withColumn("_p", F.lag("s").over(ws))
        .select(
            "doc_id",
            F.when(F.col("_p").isNull(), F.lit(8))
            .otherwise(F.least(F.lit(8), F.col("s") - F.col("_p")))
            .alias("_cv"),
        )
        .groupBy("doc_id")
        .agg(F.sum("_cv").alias("c"))
    )
    got = {r["doc_id"]: r["c"] for r in cov.collect()}
    for i, (n_tok, n_cov) in enumerate(ref):
        assert got.get(i, 0) == n_cov, f"doc {i}: got {got.get(i, 0)}, want {n_cov}"


def test_substring_coverage_pins_retired_censusjoin_form(spark, sf_dir):
    """Full-query equivalence pin: the r13 single-construction form must
    return exactly the retired census+join form's rows (same order — both
    end in orderBy(lang))."""
    from hdc_dataengineering_sqlsync_spark.plans.roundseven import (
        _substring_coverage_censusjoin,
        dedup_substring_coverage,
    )

    new_rows = [tuple(r) for r in dedup_substring_coverage(spark, sf_dir).collect()]
    old_rows = [tuple(r) for r in _substring_coverage_censusjoin(spark, sf_dir).collect()]
    assert new_rows == old_rows
