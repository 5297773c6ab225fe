"""Unit tests for the LLM-data-pipeline operators beyond the oracle gate:
recall properties of the near-dup detectors, mapInPandas multimodal
plumbing (fake path + stub gate), and the IVF vs brute-force relationship.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e02_spark import fixtures
from e02_spark.io import load_table
from e02_spark.ops.dedup import exact_dedup, minhash_lsh_pairs
from e02_spark.ops.multimodal import decode_features, media_summary
from e02_spark.ops.similarity import ivf_topk, topk_bruteforce

SF = "/root/testdata/sf0.001"


def test_minhash_finds_planted_neardups(spark):
    d = load_table(spark, SF, "documents")
    pairs = minhash_lsh_pairs(d, k=4, bands=2, threshold=0.8).collect()
    assert len(pairs) > 0  # the driver corpus has planted ~0.99-Jaccard pairs
    assert all(r["jaccard"] >= 0.8 for r in pairs)
    assert all(r["da"] < r["db"] for r in pairs)


def test_exact_dedup_keeps_lowest_key(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], schema="id BIGINT, k STRING"
    )
    kept = {r["k"]: r["id"] for r in exact_dedup(df, ["k"], "id").collect()}
    assert kept == {"x": 1, "y": 2}


def test_topk_excludes_query_and_is_sorted(spark):
    e = load_table(spark, SF, "embeddings")
    rows = topk_bruteforce(e, query_vec_id=0, k=5).collect()
    assert len(rows) == 5
    assert all(r["vec_id"] != 0 for r in rows)
    scores = [r["cosine"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ivf_results_subset_of_cluster(spark):
    e = load_table(spark, SF, "embeddings")
    rows = ivf_topk(e, query_vec_id=0, n_centroids=8, k=5).collect()
    assert len(rows) == 5
    assert len({r["centroid_id"] for r in rows}) == 1  # all from one cell


def test_multimodal_fake_decode_plumbing(spark):
    media = fixtures.spark_df(spark, "media")
    feats = {r["media_id"]: r for r in decode_features(media).collect()}
    assert set(feats) == {1, 2, 3, 4, 5}
    raw = {m[0]: m[4] for m in fixtures.MEDIA}
    for mid, row in feats.items():
        payload = raw[mid]
        assert row["n_bytes"] == len(payload)
        assert row["feat_max"] == max(payload)
        assert abs(row["feat_mean"] - sum(payload) / len(payload)) < 1e-12


def test_multimodal_real_decode_is_stubbed(spark):
    media = fixtures.spark_df(spark, "media")
    with pytest.raises(Exception, match="NotImplementedError|codec decode"):
        decode_features(media, real_decode=True).collect()


def test_media_summary_aspect_null_for_audio(spark):
    rows = {r["media_id"]: r for r in media_summary(fixtures.spark_df(spark, "media")).collect()}
    assert rows[3]["aspect"] is None
    assert rows[1]["aspect"] == 640 / 480


def test_ml_minhash_agrees_with_md5_minhash(spark):
    from e02_spark.queries.llm_q import q31_minhash_lsh_neardup, q52_ml_minhash_lsh

    md5_pairs = {
        (r["da"], r["db"]) for r in q31_minhash_lsh_neardup(spark, SF).collect()
    }
    ml_pairs = {(r["da"], r["db"]) for r in q52_ml_minhash_lsh(spark, SF).collect()}
    # both detectors must find the planted near-dups; the md5 variant is
    # exact-verified at >=0.8 Jaccard, so it must be a subset of the ML
    # join's 0.4-distance (>=0.6 similarity) candidates
    assert md5_pairs, "no planted near-dups found"
    assert md5_pairs <= ml_pairs


def test_documents_all_texts_distinct_then_dedup_noop(spark):
    d = load_table(spark, SF, "documents")
    assert exact_dedup(d, ["text"], "doc_id").count() == d.count()


def test_cosine_helper_matches_quantized_path(spark):
    from e02_spark.ops.similarity import cosine

    e = load_table(spark, SF, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    direct = {
        r["vec_id"]: r["c"]
        for r in e.crossJoin(q).select("vec_id", cosine("embedding", "qv").alias("c")).collect()
    }
    via_topk = {r["vec_id"]: r["cosine"] for r in topk_bruteforce(e, 0, k=5).collect()}
    for vid, c in via_topk.items():
        assert direct[vid] == c  # same integer-quantized math, bit-equal


def test_interval_overlap_join(spark):
    from datetime import datetime

    from e02_spark.ops.range_join import interval_overlap_join

    intervals = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 2, 0)),
            (2, datetime(2024, 1, 1, 3, 0), datetime(2024, 1, 1, 3, 30)),
        ],
        schema="iid BIGINT, start TIMESTAMP, end TIMESTAMP",
    )
    points = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1, 1, 0)),   # inside interval 1
            (11, datetime(2024, 1, 1, 2, 0)),   # boundary: end inclusive
            (12, datetime(2024, 1, 1, 2, 30)),  # in neither
            (13, datetime(2024, 1, 1, 3, 15)),  # inside interval 2
        ],
        schema="pid BIGINT, ts TIMESTAMP",
    )
    got = {
        (r["iid"], r["pid"])
        for r in interval_overlap_join(intervals, points, "start", "end", "ts").collect()
    }
    assert got == {(1, 10), (1, 11), (2, 13)}


def test_containment_catches_subset_dup_jaccard_misses(spark):
    """A small doc fully contained in a big doc: containment ~1.0 flags
    it; symmetric Jaccard at the same candidates stays far below 0.8."""
    from e02_spark.ops.dedup import containment_pairs, minhash_lsh_pairs

    # small ⊂ big with ~18% extra shingles in big: containment = 1.0,
    # Jaccard ≈ 0.85 — at the SAME 0.9 cutoff containment flags the pair
    # and Jaccard does not
    small = " ".join(f"tok{i}" for i in range(30))
    big = small + " " + " ".join(f"extra{i}" for i in range(5))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally unrelated words here only")],
        "doc_id BIGINT, text STRING",
    )
    cont = {(r.da, r.db) for r in containment_pairs(docs, threshold=0.9).collect()}
    assert (1, 2) in cont
    jac = {(r.da, r.db) for r in minhash_lsh_pairs(docs, threshold=0.9).collect()}
    assert (1, 2) not in jac


def test_minhash_salted_k8(spark):
    """k=8 signatures use 2 salted digests (verdict round-2 item: the
    single-md5 slicing capped k at 4). Expected mins computed
    independently with hashlib; h1..h4 must equal the unsalted k=4 form."""
    import hashlib

    from e02_spark.ops.text import minhash_signature

    sh = spark.createDataFrame(
        [(1, "aa bb cc"), (1, "bb cc dd"), (2, "zz yy xx")],
        ["doc_id", "shingle"],
    )
    rows = {r["doc_id"]: r for r in minhash_signature(sh, k=8).collect()}

    def expected(shingles, s):
        salt = (s - 1) // 4
        off = ((s - 1) % 4) * 8
        def digest(x):
            prefix = "" if salt == 0 else f"s{salt}:"
            return hashlib.md5((prefix + x).encode()).hexdigest()
        return min(digest(x)[off : off + 8] for x in shingles)

    doc_sh = {1: ["aa bb cc", "bb cc dd"], 2: ["zz yy xx"]}
    for doc_id, shs in doc_sh.items():
        for s in range(1, 9):
            assert rows[doc_id][f"h{s}"] == expected(shs, s), (doc_id, s)

    k4 = {r["doc_id"]: r for r in minhash_signature(sh, k=4).collect()}
    for doc_id in doc_sh:
        for s in range(1, 5):
            assert rows[doc_id][f"h{s}"] == k4[doc_id][f"h{s}"]


def test_minhash_k8_duckdb_parity(spark):
    """Spark and DuckDB agree on the salted k=8 signature fragments."""
    import duckdb

    from e02_spark.ops.text import duck_minhash_sql, minhash_signature

    sh = spark.createDataFrame(
        [(1, "aa bb cc"), (1, "bb cc dd"), (2, "zz yy xx")],
        ["doc_id", "shingle"],
    )
    spark_rows = sorted(
        tuple(r) for r in minhash_signature(sh, k=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE s(doc_id BIGINT, shingle VARCHAR); "
        "INSERT INTO s VALUES (1,'aa bb cc'),(1,'bb cc dd'),(2,'zz yy xx')"
    )
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT doc_id, {duck_minhash_sql(8)} FROM s GROUP BY doc_id"
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_resize_images_rewrites_metadata_and_payload(spark):
    from e02_spark.ops.multimodal import resize_images

    media = fixtures.spark_df(spark, "media")
    rows = {r["media_id"]: r for r in resize_images(media, 64, 64).collect()}
    # images resized: metadata rewritten, payload shrunk deterministically
    raw = {m[0]: m for m in fixtures.MEDIA}
    for mid, m in raw.items():
        if m[1] == "image":
            assert rows[mid]["width"] == 64 and rows[mid]["height"] == 64
            assert 0 < len(rows[mid]["payload"]) <= 64
            # deterministic: stride-sample of the original payload
            b = m[4]
            step = max(1, len(b) // 64)
            assert bytes(rows[mid]["payload"]) == bytes(b[::step][:64])
        else:  # non-images untouched
            assert rows[mid]["width"] == m[2] and rows[mid]["height"] == m[3]
            assert bytes(rows[mid]["payload"]) == bytes(m[4])


def test_sample_frames_explodes_videos_only(spark):
    from e02_spark.ops.multimodal import sample_frames

    media = fixtures.spark_df(spark, "media")
    rows = sample_frames(media, every_n=4, frame_size=16).collect()
    # only media_id 5 is a video: 256 bytes / 16 = 16 frames, every 4th = 4
    assert {r["media_id"] for r in rows} == {5}
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 4, 8, 12]
    src = {m[0]: m[4] for m in fixtures.MEDIA}[5]
    for r in rows:
        i = r["frame_idx"]
        assert bytes(r["frame_bytes"]) == bytes(src[i * 16 : (i + 1) * 16])
        assert r["n_frame_bytes"] == 16


def test_multimodal_real_decode_paths_are_gated(spark):
    """Each real_decode path raises ONLY when its codec library is
    genuinely absent (Pillow for images, PyAV for video)."""
    from e02_spark.ops.multimodal import (
        HAS_AV,
        HAS_PIL,
        resize_images,
        sample_frames,
    )

    media = fixtures.spark_df(spark, "media")
    gated = []
    if not HAS_PIL:
        gated.append(lambda: resize_images(media, 8, 8, real_decode=True).collect())
    if not HAS_AV:
        gated.append(lambda: sample_frames(media, real_decode=True).collect())
    for fn in gated:
        with pytest.raises(Exception) as exc:
            fn()
        assert "NotImplementedError" in str(exc.value) or isinstance(
            exc.value, NotImplementedError
        )


def _png_bytes(w: int, h: int, shade: int) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (w, h), color=shade).save(buf, format="PNG")
    return buf.getvalue()


def test_multimodal_real_image_decode_with_pillow(spark):
    """real_decode=True over genuine PNGs: pixel statistics, not byte
    statistics. Runs only where Pillow is installed."""
    from e02_spark.ops.multimodal import HAS_PIL, decode_features

    if not HAS_PIL:
        pytest.skip("Pillow not installed; real image decode unavailable")
    rows = [(1, "image", 8, 6, _png_bytes(8, 6, 40)), (2, "image", 4, 4, _png_bytes(4, 4, 200))]
    media = spark.createDataFrame(
        rows, schema="media_id BIGINT, kind STRING, width BIGINT, height BIGINT, payload BINARY"
    )
    feats = {r["media_id"]: r for r in decode_features(media, real_decode=True).collect()}
    assert feats[1]["feat_mean"] == 40.0 and feats[1]["feat_max"] == 40
    assert feats[2]["feat_mean"] == 200.0 and feats[2]["feat_max"] == 200
    for mid, (_, _, _, _, payload) in zip((1, 2), rows):
        assert feats[mid]["n_bytes"] == len(payload)


def test_multimodal_real_image_resize_with_pillow(spark):
    from e02_spark.ops.multimodal import HAS_PIL, resize_images

    if not HAS_PIL:
        pytest.skip("Pillow not installed; real image resize unavailable")
    import io

    from PIL import Image

    media = spark.createDataFrame(
        [
            (1, "image", 16, 12, _png_bytes(16, 12, 90)),
            (2, "audio", 0, 0, b"\x01\x02\x03"),
        ],
        schema="media_id BIGINT, kind STRING, width BIGINT, height BIGINT, payload BINARY",
    )
    rows = {r["media_id"]: r for r in resize_images(media, 4, 4, real_decode=True).collect()}
    img = Image.open(io.BytesIO(bytes(rows[1]["payload"])))
    assert img.size == (4, 4)
    assert rows[1]["width"] == 4 and rows[1]["height"] == 4
    assert bytes(rows[2]["payload"]) == b"\x01\x02\x03"  # non-image untouched


def test_semantic_dedup_matches_numpy_bruteforce(spark):
    """semantic_dedup (q99) vs an independent numpy reimplementation of
    the same deterministic spec (floor-quantized cosine, argmax assignment
    with ties to lowest centroid id, greedy-by-id keep rule) over the real
    sf0.001 embeddings."""
    import numpy as np

    from e02_spark.io import load_table
    from e02_spark.ops.similarity import semantic_dedup

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "embeddings")
    got = {
        r["vec_id"]: (r["cluster_id"], r["dup_of"], r["kept"])
        for r in semantic_dedup(e, n_centroids=8, threshold=0.35).collect()
    }

    rows = sorted(
        (r["vec_id"], np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6))
        for r in e.select("vec_id", "embedding").collect()
    )
    ids = [v for v, _ in rows]
    Q = np.stack([q for _, q in rows])  # quantized ints as doubles (exact < 2^53)
    norms = np.sqrt((Q * Q).sum(axis=1))
    cents = Q[:8]
    cos_c = (Q @ cents.T) / np.outer(norms, norms[:8])
    # argmax with ties to lowest cid: reversed argmax of the reversed row
    cid = np.array([int(np.argmax(row)) if len(set(row)) == len(row)
                    else min(np.flatnonzero(row == row.max()))
                    for row in cos_c])
    cos = (Q @ Q.T) / np.outer(norms, norms)
    for j, vj in enumerate(ids):
        same = [i for i in range(len(ids))
                if cid[i] == cid[j] and ids[i] < vj and cos[i, j] >= 0.35]
        dup_of = min((ids[i] for i in same), default=None)
        assert got[vj] == (cid[j], dup_of, dup_of is None), (
            vj, got[vj], cid[j], dup_of
        )


def test_pii_redaction_scrubs_everything(spark):
    """q100: after redact_pii, zero PII patterns remain in any row, every
    pattern was hit at least once corpus-wide, and the redaction is
    length-changing exactly where hits occurred."""
    from e02_spark.ops import quality
    from e02_spark.queries.curation_q import q100_pii_redaction

    from e02_spark.queries.curation_q import planted_contact

    rows = q100_pii_redaction(spark, SF).collect()
    assert rows
    for r in rows:
        # the synthesized contact tail guarantees AT LEAST one of each
        # per doc (>= because the widened phone pattern may also match
        # organic digit runs in the document text — both engines agree)
        assert r["n_email"] >= r["n_docs"]
        assert r["n_phone"] >= r["n_docs"]
        assert r["n_ssn"] >= r["n_docs"]
        assert r["n_ipv4"] >= r["n_docs"]
        assert r["n_ipv6"] >= r["n_docs"]

    # scrub invariant on the actual redacted strings (same planted tail
    # as the query — shared helper, can't drift)
    docs = load_table(spark, SF, "documents")
    raw = F.concat(F.col("text"), planted_contact())
    red = docs.select(quality.redact_pii(raw).alias("red"))
    leftover = red.select(
        *[
            F.sum(F.regexp_count("red", F.lit(pat))).alias(name)
            for name, (pat, _tok) in quality.PII_PATTERNS.items()
        ]
    ).collect()[0]
    assert all(v == 0 for v in leftover.asDict().values()), leftover


def test_pii_planted_fixtures_and_dialect_parity(spark):
    """Round-6 widened PII patterns against hand-planted fixtures: every
    positive form hits exactly once, every near-miss negative hits zero
    times, and DuckDB's RE2 agrees with Spark's Java regex match-for-match
    on every fixture (the dialect-parity contract the q100 oracle relies
    on)."""
    import duckdb

    from e02_spark.ops import quality

    fixtures = [
        # (text, expected {pattern: n_matches})
        ("call 555-0123 now", {"phone": 1}),
        ("call 555-123-4567 now", {"phone": 1}),
        ("call (555) 123-4567 now", {"phone": 1}),
        ("call +1-555-123-4567 now", {"phone": 1}),
        ("call +1 (555) 123-4567 now", {"phone": 1}),
        ("call 5551234567 now", {"phone": 1}),
        ("call 555.123.4567 now", {"phone": 1}),
        ("mail a.b+c@ex-1.example.org ok", {"email": 1}),
        ("host 192.168.0.1 up", {"ipv4": 1}),
        ("ssn 123-45-6789 here", {"ssn": 1}),
        ("v6 2001:db8:85a3:0:0:8a2e:370:7334 up", {"ipv6": 1}),
        # negatives: clock, semver, 11-digit run, compressed ipv6 (out of
        # dialect scope by design), short digit runs
        ("at 12:30:45 on 2024-01-02", {}),
        ("version 1.2.3 released", {}),
        ("id 12345678901 long", {}),
        ("v6 2001:db8::7334 compressed", {}),
        ("just 555-12 and 12-3456", {}),
        ("almost 123-45-678 and 12-34-5678", {}),
    ]
    df = spark.createDataFrame([(t,) for t, _ in fixtures], "t STRING")
    counts = {
        name: [r[0] for r in
               df.select(F.regexp_count("t", F.lit(pat))).collect()]
        for name, (pat, _tok) in quality.PII_PATTERNS.items()
    }
    con = duckdb.connect()
    for name, (pat, _tok) in quality.PII_PATTERNS.items():
        for i, (txt, want) in enumerate(fixtures):
            got_spark = counts[name][i]
            assert got_spark == want.get(name, 0), (name, txt, got_spark)
            (got_duck,) = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [txt, pat]
            ).fetchone()
            assert got_duck == got_spark, (name, txt, got_duck, got_spark)
    # redaction leaves no residue on a line carrying every form at once
    loaded = " ".join(t for t, w in fixtures if w)
    (red,) = (
        spark.createDataFrame([(loaded,)], "t STRING")
        .select(quality.redact_pii(F.col("t")).alias("r"))
        .collect()[0]
    )
    leftover2 = (
        spark.createDataFrame([(red,)], "t STRING")
        .select(
            *[
                F.regexp_count("t", F.lit(pat)).alias(name)
                for name, (pat, _tok) in quality.PII_PATTERNS.items()
            ]
        )
        .collect()[0]
    )
    assert all(v == 0 for v in leftover2.asDict().values()), (red, leftover2)


def test_ivf_recall_floor_and_exhaustive_limit(spark):
    """IVF ANN quality contract on the deterministic corpus: single-probe
    recall@10 vs brute force averages >= 0.4 at 8 centroids, and with ONE
    centroid the probed cell is the whole corpus so IVF degenerates to
    exact search (recall exactly 1.0) — the coarse-to-exact limit a
    multi-probe production deployment tunes along."""
    e = load_table(spark, SF, "embeddings")
    queries = (0, 7, 13, 42, 99)

    def recall(n_centroids):
        recs = []
        for q in queries:
            bf = {r["vec_id"] for r in topk_bruteforce(e, q, k=10).collect()}
            iv = {
                r["vec_id"]
                for r in ivf_topk(e, q, n_centroids=n_centroids, k=10).collect()
            }
            recs.append(len(bf & iv) / len(bf))
        return sum(recs) / len(recs)

    assert recall(8) >= 0.4
    assert recall(1) == 1.0


def test_kmeans_centroids_deterministic_and_recall_not_worse(spark):
    """Round-6 verdict task: sampled spherical k-means centroid training
    (train='kmeans') behind a flag. Contracts: (a) training is RNG-free —
    two runs produce identical quantized centroids; (b) on the sf0.1
    embeddings, single-probe recall@10 with trained centroids is >= the
    first-n convention's recall (improves-or-ties); (c) the oracle path
    (train='first_n') is untouched — ivf_topk defaults to it."""
    from e02_spark.ops.similarity import train_centroids_kmeans

    e = load_table(spark, "/root/testdata/sf0.1", "embeddings")

    def centroid_set():
        return sorted(
            (r["cid"], tuple(r["cq"]), r["cn2"])
            for r in train_centroids_kmeans(e, 8).collect()
        )

    assert centroid_set() == centroid_set()

    queries = (0, 7, 13, 42, 99)

    def recall(train):
        recs = []
        for q in queries:
            bf = {r["vec_id"] for r in topk_bruteforce(e, q, k=10).collect()}
            iv = {
                r["vec_id"]
                for r in ivf_topk(
                    e, q, n_centroids=8, k=10, train=train
                ).collect()
            }
            recs.append(len(bf & iv) / len(bf))
        return sum(recs) / len(recs)

    assert recall("kmeans") >= recall("first_n")


def test_pq_full_rerank_equals_bruteforce(spark):
    """Product quantization exactness limit: when the rerank width covers
    the whole corpus, the exact-cosine rescoring pass sees every vector,
    so pq_topk must equal topk_bruteforce EXACTLY (same ids, same order,
    same scores) — the ADC stage then only reorders candidates it cannot
    drop. This pins the rerank stage's scoring as the same bit-exact
    quantized cosine the brute-force path uses."""
    from e02_spark.ops.similarity import pq_codebooks, pq_topk

    e = load_table(spark, SF, "embeddings")
    n = e.count()
    books = pq_codebooks(e)
    pq = [
        (r["vec_id"], r["cosine"])
        for r in pq_topk(e, 7, k=10, rerank=n, codebooks=books).collect()
    ]
    bf = [
        (r["vec_id"], r["cosine"])
        for r in topk_bruteforce(e, 7, k=10).collect()
    ]
    assert pq == bf


def test_pq_encode_jvm_side_recall_and_determinism(spark):
    """PQ ANN contracts on the sf0.01 corpus: (a) encoding is pure JVM
    expression work (no Python UDF in the plan — a 100 TB encode pass is
    map-only codegen); (b) codes have shape m with values in [0, n_codes);
    (c) recall@10 at rerank=100 clears a floor the deterministic corpus
    gives margin on; (d) two full runs (re-trained codebooks included)
    return identical rows — nothing RNG-dependent anywhere."""
    from e02_spark.ops.similarity import pq_codebooks, pq_encode, pq_topk

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    books = pq_codebooks(e)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    enc = pq_encode(e, books)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    row = enc.select("pq_codes").first()
    assert len(row["pq_codes"]) == 8
    assert all(0 <= c < 16 for c in row["pq_codes"])

    def run():
        return [
            (r["vec_id"], r["adc_dist"], r["cosine"])
            for r in pq_topk(e, 17, k=10, rerank=100).collect()
        ]

    first = run()
    bf = {r["vec_id"] for r in topk_bruteforce(e, 17, k=10).collect()}
    assert len({v for v, _, _ in first} & bf) / 10 >= 0.6
    assert run() == first


def test_chunk_audio_reconstructs_payload_exactly(spark):
    """E9 audio chunking: chunks concatenate back to the exact payload,
    timestamp arithmetic matches the byte arithmetic (start_ms/end_ms),
    the final short chunk is kept, and non-audio rows produce nothing."""
    from e02_spark.ops.multimodal import chunk_audio

    media = fixtures.spark_df(spark, "media")
    rows = chunk_audio(media, chunk_ms=3, bytes_per_ms=2).collect()
    assert rows
    audio_payloads = {
        m[0]: m[4] for m in fixtures.MEDIA if m[1] == "audio"
    }
    assert {r["media_id"] for r in rows} == set(audio_payloads)
    by_media: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["media_id"], r["chunk_idx"])):
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, chunks in by_media.items():
        payload = audio_payloads[mid]
        assert b"".join(bytes(c["chunk_bytes"]) for c in chunks) == payload
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c["start_ms"] == c["chunk_idx"] * 3
            assert c["end_ms"] == c["start_ms"] + c["n_chunk_bytes"] // 2
            assert c["n_chunk_bytes"] <= 6
        assert all(c["n_chunk_bytes"] == 6 for c in chunks[:-1])

    import pytest as _pytest

    # real_decode on NON-WAV payloads (the fixtures are raw bytes, not
    # RIFF containers) fails loudly from the wave parser, never silently
    # falls back to byte slicing
    with _pytest.raises(Exception, match="wave.Error|RIFF|Error"):
        chunk_audio(media, real_decode=True).collect()


def test_chunk_audio_real_wav_decode_sample_accurate(spark):
    """E9 real audio decode (round 8, runs in-sandbox — no skip): WAV
    payloads are decoded with the stdlib wave module; chunk boundaries
    are SAMPLE-accurate (frames [i*ms*rate//1000, (i+1)*ms*rate//1000)),
    chunk bytes are byte-exact PCM slices (sha256-pinned), the short
    final chunk is kept, end_ms derives from the end-frame position, and
    the chunks concatenate back to the full decoded PCM stream."""
    import hashlib
    import io as _io
    import wave

    from e02_spark.ops.multimodal import chunk_audio

    def make_wav(rate: int, channels: int, sampwidth: int, n_frames: int,
                 seed: int) -> tuple[bytes, bytes]:
        pcm = bytes(
            (seed + i * 31) % 256 for i in range(n_frames * channels * sampwidth)
        )
        buf = _io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(sampwidth)
            w.setframerate(rate)
            w.writeframes(pcm)
        return buf.getvalue(), pcm

    # mono 16-bit 8 kHz, 1/3 s (2666 frames -> short final chunk at 25ms
    # = 200-frame chunks); stereo 8-bit 11025 Hz (25ms*11025/1000 is
    # NON-integer: per-chunk floor arithmetic, no drift)
    wav_a, pcm_a = make_wav(8000, 1, 2, 2666, seed=7)
    wav_b, pcm_b = make_wav(11025, 2, 1, 3000, seed=99)
    media = spark.createDataFrame(
        [
            (1, "audio", 0, 0, bytearray(wav_a)),
            (2, "audio", 0, 0, bytearray(wav_b)),
            (3, "image", 4, 4, bytearray(b"\x89PNGnotaudio")),
        ],
        "media_id BIGINT, kind STRING, width INT, height INT, payload BINARY",
    )
    rows = chunk_audio(media, chunk_ms=25, real_decode=True).collect()
    assert {r["media_id"] for r in rows} == {1, 2}  # non-audio ignored

    for mid, pcm, rate, fw in ((1, pcm_a, 8000, 2), (2, pcm_b, 11025, 2)):
        chunks = sorted(
            (r for r in rows if r["media_id"] == mid),
            key=lambda r: r["chunk_idx"],
        )
        n_frames = len(pcm) // fw
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        recon = b""
        for c in chunks:
            i = c["chunk_idx"]
            start_f = i * 25 * rate // 1000
            end_f = min((i + 1) * 25 * rate // 1000, n_frames)
            want = pcm[start_f * fw : end_f * fw]
            got = bytes(c["chunk_bytes"])
            assert hashlib.sha256(got).hexdigest() == hashlib.sha256(want).hexdigest()
            assert c["start_ms"] == i * 25
            assert c["end_ms"] == end_f * 1000 // rate
            assert c["n_chunk_bytes"] == len(want)
            recon += got
        assert recon == pcm  # full decoded stream reconstructed
    # sample-accuracy spot check: 8 kHz @ 25 ms = exactly 200 frames/chunk
    a_sorted = sorted(
        (r for r in rows if r["media_id"] == 1), key=lambda r: r["chunk_idx"]
    )
    assert all(r["n_chunk_bytes"] == 200 * 2 for r in a_sorted[:-1])
    # 2666 % 200 = 66-frame short final chunk kept
    last_a = max(
        (r for r in rows if r["media_id"] == 1), key=lambda r: r["chunk_idx"]
    )
    assert last_a["n_chunk_bytes"] == 66 * 2


def test_ivf_pq_composes_cell_and_code_contracts(spark):
    """IVF-PQ composition contracts: (a) results are a subset of the
    query's IVF cell (the coarse prune really gates the scan); (b) with
    ONE centroid and corpus-wide rerank it degenerates to exact search —
    identical rows to topk_bruteforce; (c) determinism across runs."""
    from e02_spark.ops.similarity import ivf_pq_topk, ivf_topk, pq_codebooks

    e = load_table(spark, SF, "embeddings")
    n = e.count()
    books = pq_codebooks(e)

    # (b) exactness limit: 1 cell + full rerank == brute force
    full = [
        (r["vec_id"], r["cosine"])
        for r in ivf_pq_topk(
            e, 7, n_centroids=1, k=10, rerank=n, codebooks=books
        ).collect()
    ]
    bf = [
        (r["vec_id"], r["cosine"])
        for r in topk_bruteforce(e, 7, k=10).collect()
    ]
    assert full == bf

    # (a) cell-subset + (c) determinism at production-shaped settings
    def run():
        return [
            (r["vec_id"], r["centroid_id"], r["adc_dist"], r["cosine"])
            for r in ivf_pq_topk(
                e, 7, n_centroids=8, k=10, rerank=20, codebooks=books
            ).collect()
        ]

    first = run()
    assert run() == first
    cell = {r["vec_id"] for r in ivf_topk(e, 7, n_centroids=8, k=n).collect()}
    assert {v for v, _, _, _ in first} <= cell
