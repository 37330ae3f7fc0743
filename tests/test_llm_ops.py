"""LLM-pipeline operators: ground-truth checks for the paths the SQL
oracle can't express (MinHash/LSH recall, SimHash, multimodal
plumbing) plus semantics sanity for the text ops — FIXTURES.md §B.5-6.
"""

import pytest
from pyspark.sql import functions as F

import ceres_spark.operators.dedup as dd
import ceres_spark.operators.multimodal as mm
import ceres_spark.operators.similarity as sim
import ceres_spark.operators.text as text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_finds_planted_neardups(spark, docs):
    # plant exact near-dups: copy docs with one token changed
    # (FIXTURES.md §B.5 neardup-docs)
    base = docs.limit(30)
    perturbed = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.expr("substring(text, 5)")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus = base.unionByName(perturbed)
    pairs = dd.minhash_lsh_pairs(corpus, threshold=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    planted = {(r["doc_id"], r["doc_id"] + 100000) for r in base.collect()}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.8, f"minhash recall {recall} < 0.8; found={len(found)}"


def test_minhash_agrees_with_brute_force(spark, docs):
    # every pair minhash emits must truly pass the Jaccard threshold
    # (the verify stage guarantees precision == 1.0 by construction;
    # this asserts the wiring, not the theory)
    pairs = dd.minhash_lsh_pairs(docs.limit(100), threshold=0.5).collect()
    for r in pairs:
        assert r["jaccard_sim"] >= 0.5


def test_simhash_exact_dup_is_zero_hamming(spark, docs):
    two = docs.limit(1)
    dup = two.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    s = dd.simhash(two.unionByName(dup)).collect()
    assert s[0]["simhash"] == s[1]["simhash"]


def test_lsh_topk_recall_vs_brute(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    brute = sim.topk_brute(emb, queries, k=10).collect()
    approx = sim.topk_lsh(emb, queries, k=10, n_planes=4, n_tables=8).collect()
    b = {(r["query_id"], r["neighbor_id"]) for r in brute}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(a & b) / len(b)
    # multi-table OR-amplification (p=4, L=8): partial recall by
    # design; assert far above chance (per-table bucket share ≈ 1/16)
    assert recall >= 0.5, f"lsh recall {recall}"


def test_topk_label_coherence(spark, emb):
    # FIXTURES.md §B.6: top-10 neighbors of each LABEL CENTROID should
    # mostly share that label (individual vectors are too noisy — the
    # fixture's max within-label cosine is ~0.47)
    import numpy as np

    pdf = emb.toPandas()
    centroids = []
    for label, grp in pdf.groupby("label"):
        c = np.mean(np.stack(grp["embedding"].map(np.asarray)), axis=0)
        centroids.append((-(int(label) + 1), [float(x) for x in c], int(label)))
    qdf = spark.createDataFrame(
        centroids, "vec_id long, embedding array<float>, label int"
    )
    rows = sim.topk_brute(emb, qdf, k=10).collect()
    qlabel = {vid: lab for vid, _, lab in centroids}
    same = sum(1 for r in rows if r["label"] == qlabel[r["query_id"]])
    # numpy ground truth on this fixture gives ~0.4 purity (the label
    # signal is weak by construction: max within-label cosine ≈ 0.47);
    # assert well above the 0.1 chance level for 10 labels
    assert same / len(rows) >= 0.25, f"centroid label coherence {same / len(rows)}"


def test_multimodal_feature_extraction(spark, docs):
    assets = mm.assets_from_documents(docs.limit(50))
    feats = mm.extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r["features"]) == mm.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["features"])
        assert r["n_bytes"] > 0 and len(r["content_sha1"]) == 40
    # deterministic: same content → same features
    again = {r["asset_id"]: r["features"] for r in feats.collect()}
    assert all(again[r["asset_id"]] == r["features"] for r in rows)


def test_multimodal_decode_real_rejects_unsupported_containers():
    # baseline, multi-scan, progressive AND (since r8) arithmetic
    # JPEG now decode built-in (test_jpeg.py, test_jpeg_arith.py);
    # the loud-gap contract moves to containers with no pure-numpy
    # decoder (MP3) and to the differential-hierarchy processes
    # (SOF5+) — both raise so a codec library can be plugged into
    # the same slot
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"ID3\x04\x00 not decodable audio", "audio")
    import numpy as np
    p = bytearray(mm.encode_jpeg(np.zeros((8, 8, 3), np.uint8), 90))
    i = bytes(p).find(b"\xff\xc0")
    p[i + 1] = 0xC5  # differential sequential
    with pytest.raises(NotImplementedError):
        mm.decode_real(bytes(p), "image")


def test_ppm_golden_bytes_and_roundtrip():
    import numpy as np
    # golden: hand-written header with a comment line, 3x2 image
    golden = b"P6\n# comment\n3 2\n255\n" + bytes(range(18))
    arr = mm.decode_ppm(golden)
    assert arr.shape == (2, 3, 3)
    assert arr.flatten().tolist() == list(range(18))
    # encode → decode round-trip is the identity on pixels
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (mm.decode_ppm(mm.encode_ppm(img)) == img).all()
    kind, px = mm.decode_real(mm.encode_ppm(img), "image")
    assert kind == "image" and (px == img).all()


def test_wav_golden_bytes_and_roundtrip():
    import struct
    import numpy as np
    # golden: canonical 44-byte header, 4 mono samples @ 8kHz
    samples = struct.pack("<4h", -32768, -1, 0, 32767)
    golden = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 8) + samples
    )
    arr, rate = mm.decode_wav(golden)
    assert rate == 8000
    assert arr[:, 0].tolist() == [-32768, -1, 0, 32767]
    # stereo round-trip
    st = np.arange(-50, 50, dtype=np.int16).reshape(-1, 2)
    arr2, r2 = mm.decode_wav(mm.encode_wav(st, rate=22050, channels=2))
    assert r2 == 22050 and (arr2 == st).all()


def test_y4m_golden_bytes_and_roundtrip():
    import numpy as np
    # golden: hand-written C444 header, 2 frames of 2x1 YUV
    golden = (
        b"YUV4MPEG2 W2 H1 F30:1 Ip A1:1 C444\n"
        + b"FRAME\n" + bytes([10, 11, 20, 21, 30, 31])
        + b"FRAME\n" + bytes([110, 111, 120, 121, 130, 131])
    )
    frames, fps = mm.decode_y4m(golden)
    assert fps == 30.0 and frames.shape == (2, 1, 2, 3)
    # planar layout: frame 0, pixel 0 = (Y=10, U=20, V=30)
    assert frames[0, 0, 0].tolist() == [10, 20, 30]
    assert frames[1, 0, 1].tolist() == [111, 121, 131]
    # encode → decode round-trip is the identity on frames
    rng = np.random.default_rng(7)
    vid = rng.integers(0, 256, (3, 4, 5, 3), dtype=np.uint8)
    back, fps2 = mm.decode_y4m(mm.encode_y4m(vid, fps_num=12))
    assert fps2 == 12.0 and (back == vid).all()
    kind, fr, fps3 = mm.decode_real(mm.encode_y4m(vid), "video")
    assert kind == "video" and (fr == vid).all()
    # subsampled chroma needs a codec plug-in — detect, don't garble
    with pytest.raises(NotImplementedError):
        mm.decode_y4m(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n" + bytes(6))


def test_video_features_and_frame_sampling(spark):
    import numpy as np
    # static video: zero motion everywhere; luma = constant
    vid = np.full((4, 3, 3, 3), 100, dtype=np.uint8)
    f = mm.real_features(mm.encode_y4m(vid, fps_num=30), "video")
    assert abs(f[2] - 100 / 255) < 1e-12  # mean Y
    assert f[6] == 0.0 and f[7] == 0.0    # motion, gradient
    assert abs(f[1] - 0.5) < 1e-12        # fps/60
    # frame sampler: every 2nd frame, motion 0 except nothing moves
    assets = spark.createDataFrame(
        [(1, "video", bytearray(mm.encode_y4m(vid)))],
        "asset_id long, modality string, payload binary",
    )
    rows = mm.frame_sample_real(assets, every_n=2).collect()
    assert [(r["asset_id"], r["frame_idx"]) for r in rows] == [
        (1, 0), (1, 2),
    ]
    assert all(r["motion"] == 0.0 for r in rows)


def test_real_features_match_numpy_reference():
    import numpy as np
    img = np.full((4, 4, 3), 128, dtype=np.uint8)
    f = mm.real_features(mm.encode_ppm(img), "image")
    # constant image: channel means 128/255, std 0, zero gradient
    assert abs(f[2] - 128 / 255) < 1e-12
    assert f[5] == 0.0 and f[7] == 0.0
    # full-scale square wave: RMS == peak == 1, DC ~ 0
    sq = np.tile([32767, -32767], 512).astype(np.int16)
    fa = mm.real_features(mm.encode_wav(sq, rate=16000), "audio")
    assert abs(fa[2] - 32767 / 32768) < 1e-9   # RMS
    assert abs(fa[5] - 32767 / 32768) < 1e-9   # peak
    assert abs(fa[7]) < 1e-9                   # DC offset


def test_multimodal_real_pipeline_end_to_end(spark, docs):
    # encode real PPM/WAV payloads from documents, decode them back,
    # extract content features — no stub anywhere in this path
    assets = mm.real_assets_from_documents(docs.limit(40))
    feats = mm.extract_features(assets, real=True).collect()
    assert len(feats) == 40
    by_mod = {}
    for r in feats:
        by_mod.setdefault(r["modality"], 0)
        by_mod[r["modality"]] += 1
        assert len(r["features"]) == mm.FEATURE_DIM
        assert r["n_bytes"] > 44  # real container, not raw text
    assert by_mod.get("image", 0) > 0 and by_mod.get("audio", 0) > 0
    # determinism: re-running the pipeline reproduces features
    again = {
        r["asset_id"]: r["features"]
        for r in mm.extract_features(assets, real=True).collect()
    }
    assert all(again[r["asset_id"]] == r["features"] for r in feats)


def test_frame_sample_plan(spark, docs):
    assets = mm.assets_from_documents(docs.limit(30))
    frames = mm.frame_sample(assets, every_ms=500)
    rows = frames.groupBy("asset_id").count().collect()
    assert rows and all(r["count"] >= 1 for r in rows)


def test_quality_score_bounds(spark, docs):
    rows = text.quality_score(docs).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)


def test_lang_id_deterministic_tiebreak(spark):
    # 'la' appears in both es and fr marker lists → tie → alphabetical
    d = spark.createDataFrame(
        [(1, "la la la", "fr", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert text.lang_id(d).collect()[0]["lang_pred"] == "es"


def test_jaccard_vectorized_bit_identical_to_declarative(spark, docs):
    a = dd.jaccard_pairs(docs, threshold=0.5).collect()
    b = dd.jaccard_pairs_vectorized(docs, threshold=0.5).collect()
    ka = sorted((r["doc_a"], r["doc_b"], r["jaccard_sim"]) for r in a)
    kb = sorted((r["doc_a"], r["doc_b"], r["jaccard_sim"]) for r in b)
    assert ka == kb and len(ka) > 0


def test_neardup_vectorized_bit_identical_to_declarative(spark, emb):
    # declarative label-blocked join (the pre-vectorization query shape)
    nrm = sim.norm(sim.as_double(F.col("embedding")))
    l = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"), nrm.alias("_na"), "label")
    r = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"), nrm.alias("_nb"), "label")
    decl = (
        l.join(r, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", sim.cosine_prenorm(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")))
        .filter(F.col("cosine_sim") >= 0.30)
        .select("id_a", "id_b", "cosine_sim")
    ).collect()
    vec = sim.neardup_pairs_blocked(emb, threshold=0.30).collect()
    ka = sorted((x["id_a"], x["id_b"], x["cosine_sim"]) for x in decl)
    kb = sorted((x["id_a"], x["id_b"], x["cosine_sim"]) for x in vec)
    assert ka == kb and len(ka) > 0


def test_neardup_triangle_sharding_bit_identical(spark, emb):
    """shards=S must produce the exact same pair set and scores as
    the unsharded path (each pair scored in exactly one shard-pair
    group; per-pair dot depends only on its own two rows)."""
    a = sim.neardup_pairs_blocked(emb, threshold=0.25).collect()
    b = sim.neardup_pairs_blocked(emb, threshold=0.25, shards=3).collect()
    ka = sorted((x["id_a"], x["id_b"], x["cosine_sim"]) for x in a)
    kb = sorted((x["id_a"], x["id_b"], x["cosine_sim"]) for x in b)
    assert ka == kb and len(ka) > 0


def test_jaccard_triangle_sharding_bit_identical(spark, docs):
    a = dd.jaccard_pairs_vectorized(docs, threshold=0.5).collect()
    b = dd.jaccard_pairs_vectorized(docs, threshold=0.5, shards=3).collect()
    ka = sorted((r["doc_a"], r["doc_b"], r["jaccard_sim"]) for r in a)
    kb = sorted((r["doc_a"], r["doc_b"], r["jaccard_sim"]) for r in b)
    assert ka == kb and len(ka) > 0


def test_pii_scrub_counts_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+x@e.org ip 10.0.0.1 tel 555-123-4567"),
            (2, "no pii here at all"),
            (3, "phone +1 555 123 4567 and 999-888-7777 twice"),
        ],
        "doc_id long, text string",
    )
    import ceres_spark.operators.text as text

    rows = {r["doc_id"]: r for r in text.pii_scrub(docs).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (2, 1, 1)
    assert (rows[2]["n_email"], rows[2]["n_ipv4"], rows[2]["n_phone"]) == (0, 0, 0)
    assert rows[3]["n_phone"] == 2
    # redaction changes the hash only when something matched
    import hashlib

    assert rows[2]["scrubbed_md5"] == hashlib.md5(
        b"no pii here at all"
    ).hexdigest()


def test_repetition_stats_degenerate_and_varied(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),        # all one token
            (2, "a b c d"),                     # all distinct
            (3, "solo"),                        # 1 token → no bigrams
        ],
        "doc_id long, text string",
    )
    import ceres_spark.operators.text as text

    rows = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    assert rows[1]["top_token_share"] == 1.0
    assert rows[1]["dup_bigram_frac"] == 1.0 - 1.0 / 3.0   # 3 bigrams, 1 distinct
    assert rows[2]["top_token_share"] == 0.25
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[3]["dup_bigram_frac"] is None               # guarded, not 0/0


def test_label_centroids_median_and_dim_order(spark):
    import ceres_spark.operators.similarity as sim

    emb = spark.createDataFrame(
        [
            ("a", [1.0, 10.0]),
            ("a", [3.0, 30.0]),
            ("a", [100.0, 20.0]),   # outlier in dim 0 — median shrugs
            ("b", [0.0, 1.0]),
        ],
        "label string, embedding array<float>",
    )
    cents = {r["label"]: r["centroid"] for r in sim.label_centroids(emb).collect()}
    assert cents["a"] == [3.0, 20.0]       # per-dim median, dim order kept
    assert cents["b"] == [0.0, 1.0]
    out = sim.label_centroid_similarity(emb).collect()
    assert len(out) == 1 and out[0]["label_a"] == "a"


def test_q8_topk_recall_vs_float_brute(spark, emb):
    import ceres_spark.operators.similarity as sim

    brute = sim.topk_brute(emb, emb.filter(emb["vec_id"] < 5), k=10)
    want = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.topk_cosine_quantized(emb, k=10).collect()
    }
    # int8 error ~1/127/component: ranking mostly survives
    assert len(want & got) / len(want) >= 0.8


def test_q8_quantization_range(spark, emb):
    import ceres_spark.operators.similarity as sim
    from pyspark.sql import functions as F

    q = sim.quantize_embeddings(emb)
    bad = q.filter(
        F.exists("q", lambda x: (x > 127) | (x < -127))
    ).count()
    assert bad == 0
    # max-|x| component maps to ±127 exactly
    hit = q.filter(F.array_max("q") == 127).count() + q.filter(
        F.array_min("q") == -127
    ).count()
    assert hit > 0


def test_fuzzy_pairs_finds_planted_typo(spark):
    import ceres_spark.operators.dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "s", "the quick brown fox jumps over"),
            (2, "s", "the quick brwon fox jumps over"),   # transposition
            (3, "s", "completely different text here now"),
            (4, "t", "the quick brown fox jumps over"),   # other block
        ],
        "doc_id long, source string, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r["edit_dist"]
           for r in dd.fuzzy_pairs(docs, prefix_len=24, max_dist=3).collect()}
    assert out == {(1, 2): 2}   # typo pair found; cross-block excluded


def test_fuzzy_banded_equals_quadratic(spark, docs):
    # the segment-pigeonhole candidate filter is lossless, so the
    # verified output must be bit-identical to the Σ block² path
    quad = {(r["doc_a"], r["doc_b"], r["edit_dist"])
            for r in dd.fuzzy_pairs(docs, max_dist=6).collect()}
    band = {(r["doc_a"], r["doc_b"], r["edit_dist"])
            for r in dd.fuzzy_pairs_banded(docs, max_dist=6).collect()}
    assert quad == band and len(band) > 0


def test_fuzzy_banded_finds_planted_typo(spark):
    docs = spark.createDataFrame(
        [
            (1, "s", "the quick brown fox jumps over"),
            (2, "s", "the quick brwon fox jumps over"),   # transposition
            (3, "s", "completely different text here now"),
            (4, "t", "the quick brown fox jumps over"),   # other block
            (5, "s", "tiny"),                             # short-string path
            (6, "s", "tinny"),
        ],
        "doc_id long, source string, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r["edit_dist"]
           for r in dd.fuzzy_pairs_banded(
               docs, prefix_len=24, max_dist=3).collect()}
    assert out == {(1, 2): 2, (5, 6): 1}


def test_fuzzy_banded_joins_on_segments_not_block(spark, docs):
    # the candidate join must key on the segment gram, not only the
    # block column — that's the whole sub-quadratic claim
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dd.fuzzy_pairs_banded(docs, max_dist=6).explain("formatted")
    plan = buf.getvalue()
    assert "_seg" in plan, plan


def test_span_dup_ratio_semantics(spark):
    # doc 2 repeats doc 1's text → every span duplicated in both;
    # doc 3 is unrelated → zero duplicated spans
    shared = "a b c d e f g h i j k l"
    docs = spark.createDataFrame(
        [(1, "s", shared), (2, "s", shared),
         (3, "s", "z y x w v u t s r q p o")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in dd.span_dup_ratio(docs, k=8).collect()}
    assert out[1]["dup_ratio"] == 1.0 and out[2]["dup_ratio"] == 1.0
    assert out[3]["dup_ratio"] == 0.0
    assert out[1]["n_spans"] == 12 - 8 + 1


def test_token_rarity_hapax(spark):
    import ceres_spark.operators.corpus as corp
    docs = spark.createDataFrame(
        [(1, "en", "s", "common words here"),
         (2, "en", "s", "common words there"),
         (3, "en", "s", "common unique")],
        "doc_id long, lang string, source string, text string",
    )
    out = {r["doc_id"]: r for r in corp.token_rarity(docs).collect()}
    # 'common' df=3 → ppm 1_000_000; 'unique' df=1 → ppm 333_333
    assert out[3]["min_df_ppm"] == 333_333
    assert out[3]["n_hapax"] == 1
    assert out[1]["n_distinct_tokens"] == 3
    assert out[1]["sum_df_ppm"] == 1_000_000 + 666_666 + 333_333


def test_simhash_banded_equals_brute(spark, docs):
    # pigeonhole bands (b = max_hamming+1) are a LOSSLESS candidate
    # generator: banded output == brute-force blocked pairing
    s = dd.simhash(docs).join(docs.select("doc_id", "source"), "doc_id")
    a = s.select(F.col("doc_id").alias("doc_a"),
                 F.col("simhash").alias("_ha"),
                 F.col("source").alias("_blk"))
    b = s.select(F.col("doc_id").alias("doc_b"),
                 F.col("simhash").alias("_hb"),
                 F.col("source").alias("_blk"))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, "_blk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b",
                dd.hamming64(F.col("_ha"), F.col("_hb")).alias("hamming"))
        .filter(F.col("hamming") <= 12)
        .collect()
    }
    banded = {(r["doc_a"], r["doc_b"], r["hamming"])
              for r in dd.simhash_pairs(docs, max_hamming=12).collect()}
    assert brute == banded and len(banded) > 0
    # global (unblocked) pairing is a superset of any blocked pairing
    n_global = dd.simhash_pairs(docs, max_hamming=12,
                                block_col=None).count()
    assert n_global >= len(banded)


def test_simhash_pairs_carry_matches_joinback(spark, docs):
    # optimization r12: `carry` evaluates per-doc expressions inside
    # the fingerprint projection and carries them through the band
    # join — must equal the old shape's explicit join-back, and must
    # not change the pair set
    base = {(r["doc_a"], r["doc_b"], r["hamming"])
            for r in dd.simhash_pairs(docs, max_hamming=12).collect()}
    carried = dd.simhash_pairs(
        docs, max_hamming=12,
        carry={"_src": F.col("source")},
    ).collect()
    assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in carried} == base
    src = {r["doc_id"]: r["source"]
           for r in docs.select("doc_id", "source").collect()}
    for r in carried:
        assert r["_src_a"] == src[r["doc_a"]]
        assert r["_src_b"] == src[r["doc_b"]]


def test_simhash_banded_joins_on_bands_not_block(spark, docs):
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dd.simhash_pairs(docs, max_hamming=12).explain("formatted")
    plan = buf.getvalue()
    assert "_band_val" in plan, plan


def test_video_features_zero_frames_are_finite():
    # ADVICE r3: a zero-frame Y4M payload must yield all-zero (not
    # NaN) motion/gradient features
    import math

    import numpy as np

    empty = np.empty((0, 2, 2, 3), dtype=np.uint8)
    f = mm.real_features(mm.encode_y4m(empty, fps_num=30), "video")
    assert all(math.isfinite(x) for x in f)
    assert f[2] == 0.0 and f[6] == 0.0 and f[7] == 0.0


def test_embedding_decontamination_empty_eval_raises(spark):
    # ADVICE r3: an empty eval side would silently drop EVERY training
    # row through the inner broadcast join — raise instead
    emb2 = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="eval_vectors is empty"):
        sim.embedding_decontamination(emb2, emb2.filter("vec_id < 0"))


def test_codec_registry_flows_through_spark_operators(spark):
    # VERDICT r3 #7: the production JPEG/PNG path — a third-party
    # decoder registered with register_codec must flow through the
    # REAL Spark operators (mapInPandas in separate worker processes;
    # the plan-build-time snapshot ships the hook via cloudpickle)
    import numpy as np

    def toy_codec(payload, modality):
        # "decodes" a fake compressed container: magic + raw bytes
        if not payload or payload[:4] != b"TOYC":
            return None
        if modality == "image":
            side = int(payload[4])
            px = np.frombuffer(
                payload[5 : 5 + side * side * 3], dtype=np.uint8
            ).reshape(side, side, 3)
            return ("image", px)
        if modality == "video":
            n, side = int(payload[4]), int(payload[5])
            fr = np.frombuffer(
                payload[6 : 6 + n * side * side * 3], dtype=np.uint8
            ).reshape(n, side, side, 3)
            return ("video", fr, 10.0)
        return None

    img = np.full((2, 2, 3), 77, dtype=np.uint8)
    vid = np.full((4, 2, 2, 3), 50, dtype=np.uint8)
    img_payload = b"TOYC" + bytes([2]) + img.tobytes()
    vid_payload = b"TOYC" + bytes([4, 2]) + vid.tobytes()

    # unregistered: the gap is loud
    with pytest.raises(NotImplementedError, match="register_codec"):
        mm.decode_real(img_payload, "image")

    mm.register_codec(toy_codec)
    try:
        assets = spark.createDataFrame(
            [
                (1, "image", bytearray(img_payload)),
                (2, "video", bytearray(vid_payload)),
            ],
            "asset_id long, modality string, payload binary",
        )
        feats = {
            r["asset_id"]: r["features"]
            for r in mm.extract_features(assets, real=True).collect()
        }
        assert abs(feats[1][2] - 77 / 255) < 1e-6  # mean R via codec
        assert abs(feats[2][2] - 50 / 255) < 1e-6  # mean Y via codec
        frames = mm.frame_sample_real(assets, every_n=2).collect()
        assert [(r["asset_id"], r["frame_idx"]) for r in frames] == [
            (2, 0), (2, 2),
        ]
    finally:
        mm.unregister_codec(toy_codec)


def test_bloom_decontaminate_equals_exact_contamination(spark, docs):
    # the Bloom stage only PRUNES: output must equal contamination()
    # bit-for-bit, including at a deliberately tiny (high-fpp) bitmap
    ev = docs.filter("doc_id % 7 = 0").select("text")
    rest = docs.filter("doc_id % 7 != 0")
    want = sorted(map(tuple, dd.contamination(rest, ev).collect()))
    for bits in (1 << 20, 1 << 10):  # healthy and fpp-heavy blooms
        got = sorted(
            map(tuple, dd.bloom_decontaminate(rest, ev, bits=bits).collect())
        )
        assert got == want, bits


def test_phash_planted_neardups(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    tweak = base.copy()
    tweak[:2, :2] = 0  # small local edit
    other = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        [(1, "image", bytearray(mm.encode_ppm(base))),
         (2, "image", bytearray(mm.encode_ppm(tweak))),
         (3, "image", bytearray(mm.encode_ppm(other)))],
        "asset_id long, modality string, payload binary",
    )
    hashes = {r["asset_id"]: r["phash"] for r in
              mm.image_phash(assets).collect()}
    assert len(hashes) == 3
    pairs = {(r["asset_a"], r["asset_b"])
             for r in mm.phash_pairs(assets, max_hamming=6).collect()}
    assert (1, 2) in pairs          # planted near-dup found
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # hamming via the banded path equals direct popcount
    direct = bin((hashes[1] ^ hashes[2]) & ((1 << 64) - 1)).count("1")
    assert direct <= 6


def test_temperature_mix_apportionment(spark, docs):
    import ceres_spark.operators.corpus as corp

    for temp in ("sqrt", "proportional"):
        out = corp.temperature_mix(
            docs, target_total_tokens=12_345, temperature=temp
        ).collect()
        assert sum(r["alloc_tokens"] for r in out) == 12_345  # exact
        assert all(r["alloc_tokens"] >= 0 for r in out)
    # sqrt temperature flattens: the biggest source's share shrinks
    sq = {r["source"]: r["alloc_tokens"] for r in corp.temperature_mix(
        docs, target_total_tokens=100_000, temperature="sqrt").collect()}
    pr = {r["source"]: r["alloc_tokens"] for r in corp.temperature_mix(
        docs, target_total_tokens=100_000,
        temperature="proportional").collect()}
    big = max(pr, key=pr.get)
    assert sq[big] <= pr[big]
    with pytest.raises(ValueError):
        corp.temperature_mix(docs, temperature="cubic")


def test_text_normalize_semantics(spark):
    rows = [
        (1, "Hello <b>World</b>!"),
        (2, "A &amp; B &lt;tag&gt; &quot;q&quot; &apos;s&apos;"),
        (3, "don't   stop-go\t\nnow"),
        (4, ""),
    ]
    out = {r["doc_id"]: r for r in text.text_normalize(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()}
    assert out[1]["norm_text"] == "hello world"
    assert out[2]["norm_text"] == "a b tag q 's'"
    assert out[3]["norm_text"] == "don't stop-go now"
    assert out[4]["norm_text"] == "" and out[4]["n_norm_tokens"] == 0
    assert out[3]["n_norm_tokens"] == 3


def test_hard_negatives_band_and_exclusions(spark, emb):
    got = sim.hard_negatives(
        emb.filter("vec_id >= 25"), emb.filter("vec_id < 25"),
        k=5, sim_lo=0.05, sim_hi=0.60,
    ).collect()
    assert got, "band should be populated on the fixture"
    by_q = {}
    for r in got:
        assert 0.05 <= r["cosine_sim"] < 0.60      # in-band only
        assert r["neg_id"] >= 25                   # corpus side only
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r["cosine_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) <= 5


def test_ngram_novelty_semantics(spark):
    base = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, base),                      # first owner of all its spans
        (2, base),                      # exact copy: zero novelty
        (3, " ".join(f"x{i}" for i in range(20))),  # all novel
    ]
    out = {r["doc_id"]: r for r in dd.ngram_novelty(
        spark.createDataFrame(rows, "doc_id long, text string"), k=8
    ).collect()}
    assert out[1]["novelty_ppm"] == 1_000_000
    assert out[2]["n_novel"] == 0 and out[2]["novelty_ppm"] == 0
    assert out[3]["novelty_ppm"] == 1_000_000
    assert out[1]["n_spans"] == 13  # 20 tokens → 13 distinct 8-grams


def test_audio_fingerprint_gain_invariant_pairs(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    clip = (rng.normal(0, 3000, 4096)).astype(np.int16)
    louder = np.clip(clip.astype(np.int32) * 2, -32768, 32767).astype(
        np.int16
    )
    other = (rng.normal(0, 3000, 4096)).astype(np.int16)
    assets = spark.createDataFrame(
        [(1, "audio", bytearray(mm.encode_wav(clip))),
         (2, "audio", bytearray(mm.encode_wav(louder))),
         (3, "audio", bytearray(mm.encode_wav(other)))],
        "asset_id long, modality string, payload binary",
    )
    fps = {r["asset_id"]: r["afp"] for r in
           mm.audio_fingerprint(assets).collect()}
    assert fps[1] == fps[2]  # pure gain change: identical envelope code
    pairs = {(r["asset_a"], r["asset_b"]): r["hamming"]
             for r in mm.audio_pairs(assets, max_hamming=6).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # zero-length audio: fingerprint defined (0), not NaN/crash
    assert mm._afp64(np.empty((0,), dtype=np.int16)) == 0


def test_hamming_band_pairs_weak_blocking_guard(spark):
    # review r4: sub-8-bit bands degenerate toward all-pairs at scale
    # — large dials must raise without the explicit opt-in
    fp = spark.createDataFrame(
        [(1, 5), (2, 7)], "asset_id long, phash long"
    )
    with pytest.raises(ValueError, match="allow_weak_blocking"):
        mm._hamming_band_pairs(fp, "phash", max_hamming=16)
    assert mm._hamming_band_pairs(
        fp, "phash", max_hamming=16, allow_weak_blocking=True
    ).count() == 1  # hamming(5,7)=1


def test_pca_matches_numpy_and_whitens(spark, emb):
    import numpy as np

    mu, W, s = sim.train_pca(emb, k=8, sample_n=4096)
    # reference: full-data numpy PCA with the same sign convention
    pdf = emb.orderBy("vec_id").toPandas()
    S = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    mu_ref = S.mean(axis=0)
    _, sv, Vt = np.linalg.svd(S - mu_ref, full_matrices=False)
    assert np.allclose(mu, mu_ref, atol=1e-12)
    for i in range(8):
        row = np.asarray(W[i])
        ref = Vt[i] if Vt[i][np.argmax(np.abs(Vt[i]))] > 0 else -Vt[i]
        assert np.allclose(row, ref, atol=1e-9), i
    # projection: map-only, matches numpy; whitened axes ~ unit var
    out = sim.apply_pca(emb, mu, W, s, whiten=True)
    Y = np.stack(
        out.orderBy("vec_id").toPandas()["embedding"].map(np.asarray)
    )
    assert Y.shape == (len(S), 8)
    np.testing.assert_allclose(Y.std(axis=0, ddof=1), 1.0, rtol=1e-6)
    # variance ordering: unwhitened component variances decrease
    Y2 = np.stack(
        sim.apply_pca(emb, mu, W).orderBy("vec_id")
        .toPandas()["embedding"].map(np.asarray)
    )
    v = Y2.var(axis=0)
    assert all(v[i] >= v[i + 1] - 1e-9 for i in range(7))
    # determinism: retraining reproduces the identical rotation
    mu2, W2, s2 = sim.train_pca(emb, k=8, sample_n=4096)
    assert W == W2 and mu == mu2 and s == s2


def test_pca_guards(spark):
    # review r4: rank cap, whiten-without-scales, null/ragged inputs
    import numpy as np

    few = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    mu, W, sc = sim.train_pca(few, k=8)
    assert len(W) == 2  # centered 3-row matrix has rank <= 2
    assert all(np.isfinite(sc)) and all(x > 1e-6 for x in sc)
    with pytest.raises(ValueError, match="whiten=True requires"):
        sim.apply_pca(few, mu, W, whiten=True)
    bad_null = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="NULL embedding"):
        sim.apply_pca(bad_null, mu, W).collect()
    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="embedding length"):
        sim.apply_pca(ragged, mu, W).collect()


def test_minhash_portable_matches_pure_python_reference(spark):
    # the portable formulation's whole pipeline — md5-low31 shingle
    # hashes, affine permutations mod 2^31, band keys, candidate set,
    # exact Jaccard — recomputed in pure Python and compared as a SET
    # (banding included: a pair must appear iff >=1 band key matches)
    import hashlib

    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "the quick brown fox jumps over the lazy dog tonight",
        3: "completely different words about spark physical plans",
        4: "the quick brown fox jumps over the lazy dog today",
        5: "short text",  # n < k -> whole-text shingle fallback
        6: "short text",
    }
    M = 1 << 31

    def low31(s):
        d = hashlib.md5(s.encode()).digest()
        return int.from_bytes(d[8:16], "little") & 0x7FFFFFFF

    def ref(num_hashes=32, bands=8, k=3, thr=0.5):
        r = num_hashes // bands
        hsets, bandkeys = {}, {}
        for did, t in texts.items():
            toks = t.lower().split(" ")
            if len(toks) >= k:
                sh = {" ".join(toks[i:i + k])
                      for i in range(len(toks) - k + 1)}
            else:
                sh = {" ".join(toks)}
            hs = {low31(s) for s in sh}
            sig = [
                min(((2 * i + 1) * 2654435761 % M * h
                     + (i * 2246822519 + 3266489917) % M) % M
                    for h in hs)
                for i in range(num_hashes)
            ]
            hsets[did] = hs
            bandkeys[did] = [
                ",".join(map(str, sig[j * r:(j + 1) * r]))
                for j in range(bands)
            ]
        out = set()
        ids = sorted(texts)
        for ai, a in enumerate(ids):
            for b in ids[ai + 1:]:
                if any(x == y for x, y in zip(bandkeys[a], bandkeys[b])):
                    inter = len(hsets[a] & hsets[b])
                    j = inter / (len(hsets[a]) + len(hsets[b]) - inter)
                    if j >= thr:
                        out.add((a, b, j))
        return out

    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard_sim"])
        for r in dd.minhash_pairs_portable(df).collect()
    }
    expect = ref()
    assert got == expect
    # sanity on the fixture itself: the exact dup pair and the
    # one-token-changed pair are found, the unrelated doc is not
    assert (1, 4, 1.0) in expect and (5, 6, 1.0) in expect
    assert any(a == 1 and b == 2 for a, b, _ in expect)
    assert not any(3 in (a, b) for a, b, _ in expect)
