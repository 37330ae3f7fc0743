"""Context-window preparation (north-star §2.2 training pipeline):
split documents into overlapping token-window chunks, then pack
chunks into fixed-size training sequences.

Both stages are the shapes a 100 TB tokenization job needs:
- chunking is map-only — the chunk list is built as ONE array column
  and exploded (the array is the explode input, so it is evaluated
  once per document; sibling computed columns would be re-evaluated
  per chunk — the Catalyst no-let-binding trap, see
  text.repetition_stats).
- packing is one window pass per source partition: a running token
  count assigns each chunk to ``floor(preceding_total / ctx)`` — the
  deterministic contiguous-fill packing (concatenate in order, cut
  every ctx tokens). First-fit-decreasing would pack ~equally well
  but is order-sensitive and therefore partitioning-dependent; a
  deterministic result is worth more than the last few percent of
  fill here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ceres_spark.operators.text import tokens


def chunk_documents(
    docs: DataFrame, size: int = 64, stride: int = 48
) -> DataFrame:
    """Overlapping token windows: chunk i covers tokens
    ``[1 + i·stride, 1 + i·stride + size)`` (1-based); the tail chunk
    may be short. ``stride < size`` gives ``size - stride`` tokens of
    overlap — the standard trick so no span falls on a chunk
    boundary.

    Returns ``doc_id, source, chunk_idx, chunk_text, n_chunk_tokens``.
    """
    t = tokens()
    starts = F.sequence(F.lit(1), F.size(t), F.lit(int(stride)))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(t, s, int(size))).alias("chunk_text"),
            F.least(F.lit(int(size)), F.size(t) - s + 1).alias(
                "n_chunk_tokens"
            ),
        ),
    )
    # (spread() was tried here and reverted: for the plain chunking/
    # packing entries the chunk HOF is light next to the exchange it
    # adds — measured 0.39 s → 2.6 s on packed_sequences at sf0.1.
    # chunk_retrieval, whose downstream embed + scoring join IS
    # CPU-heavy, spreads its input before calling in.)
    return docs.select(
        "doc_id", "source", F.posexplode(chunks).alias("chunk_idx", "_c")
    ).select(
        "doc_id",
        "source",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_c.chunk_text").alias("chunk_text"),
        F.col("_c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def pack_sequences(chunks: DataFrame, ctx: int = 256) -> DataFrame:
    """Assign chunks to fixed-``ctx`` training bins by running token
    count within each source (ordered by doc_id, chunk_idx — a total
    order, so the packing is deterministic). Returns per-bin fill
    stats: ``source, bin, n_chunks, n_tokens, fill_frac``.

    All arithmetic is integer until the final fill ratio, so the
    result is partitioning-independent.
    """
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = int(ctx)
    binned = chunks.withColumn(
        "_cum", F.sum("n_chunk_tokens").over(w).cast("long")
    ).withColumn("bin", F.expr(f"(_cum - n_chunk_tokens) DIV {c}"))
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_chunk_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn("fill_frac", F.col("n_tokens") / F.lit(c))
    )


def chunk_retrieval(
    docs: DataFrame,
    query_docs_below: int = 2,
    k: int = 5,
    dim: int = 32,
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """End-to-end retrieval over chunks — the RAG data path composed
    entirely from exact stages: overlapping token chunks
    (:func:`chunk_documents`) → model-free signed-hash embeddings
    (:func:`ceres_spark.operators.corpus.hash_embed`, exact BIGINT) →
    fold-cosine top-k per query chunk. Because every stage is
    engine-exact, the WHOLE pipeline is oracle-checkable — chunking,
    featurization and ranking verified end-to-end in one query, not
    just piecewise.

    Query chunks are the chunks of ``doc_id < query_docs_below``
    (broadcast — the query side of retrieval is always the small
    side); corpus chunks never shuffle for the scoring join. Ranking
    is totally ordered (cosine DESC, then neighbor chunk key), so
    top-k is deterministic. Same-document chunks are excluded.
    """
    from ceres_spark.operators.corpus import hash_embed
    from ceres_spark.operators.similarity import cosine
    from ceres_spark.sources.tables import spread

    def _vecs(d: DataFrame) -> DataFrame:
        chunks = chunk_documents(d, size=size, stride=stride)
        # the packed key is only injective for 0 <= chunk_idx < 1e6
        # and 0 <= doc_id < ~9.22e12 (doc_id * 1e6 must not overflow
        # BIGINT) — a >=48M-token document, a negative id, or a huge
        # id would silently corrupt retrieval, so fail LOUDLY in-plan
        # instead (raise_error is JVM-side; the happy path stays
        # codegen)
        keyed = chunks.select(
            F.when(
                (F.col("chunk_idx") >= 0)
                & (F.col("chunk_idx") < 1_000_000)
                & (F.col("doc_id") >= 0)
                & (F.col("doc_id") < 9_000_000_000_000),
                F.col("doc_id") * 1_000_000 + F.col("chunk_idx"),
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "chunk_retrieval: packed ckey out of range "
                            "(need 0 <= doc_id < 9e12 and chunk_idx < "
                            "1e6), got doc_id="
                        ),
                        F.col("doc_id").cast("string"),
                        F.lit(" chunk_idx="),
                        F.col("chunk_idx").cast("string"),
                    )
                )
            )
            .alias("ckey"),
            "doc_id",
            "chunk_idx",
            F.col("chunk_text").alias("text"),
        )
        return (
            hash_embed(
                keyed.select(F.col("ckey").alias("doc_id"), "text"),
                dim=dim,
            )
            .select(
                F.col("doc_id").alias("ckey"),
                F.expr(
                    "transform(vec, x -> cast(x as double))"
                ).alias("v"),
            )
            # a chunk whose signed buckets fully cancel has no
            # direction — exclude zero-norm vectors (mirrored in the
            # oracle) instead of dividing by zero
            .filter(F.expr("aggregate(v, 0D, (a, x) -> a + x * x) > 0"))
            # (doc_id, chunk_idx) come back out of the key
            # ARITHMETICALLY — no join back to the chunk table, which
            # would recompute the whole explode a second time
            .select(
                "ckey",
                "v",
                F.expr("ckey div 1000000").alias("doc_id"),
                (F.col("ckey") % 1_000_000).alias("chunk_idx"),
            )
        )

    # spread: hash_embed's explode-aggregate and the fold-cosine
    # scoring join both inherit the chunk layout — a one-row-group
    # scan would serialize the whole retrieval path (§2.5)
    vecs = _vecs(spread(docs))
    # query side re-derived from the FILTERED scan (optimization r12,
    # guide §2.4/§6): chunking + embedding are per-document, so the
    # query chunks equal the full pipeline filtered — the old
    # vecs.filter(...) broadcast branch re-ran the whole corpus
    # chunk→embed pipeline a second time just to keep
    # query_docs_below documents; this pushes the doc_id predicate
    # into the parquet scan and embeds only the query docs.
    q = F.broadcast(
        _vecs(docs.filter(F.col("doc_id") < int(query_docs_below)))
        .select(
            F.col("ckey").alias("q_ckey"),
            F.col("doc_id").alias("query_doc"),
            F.col("chunk_idx").alias("query_chunk"),
            F.col("v").alias("qv"),
        )
    )
    scored = (
        vecs.join(q, vecs["doc_id"] != q["query_doc"])
        .select(
            "q_ckey",
            "query_doc",
            "query_chunk",
            F.col("doc_id").alias("neighbor_doc"),
            F.col("chunk_idx").alias("neighbor_chunk"),
            F.col("ckey").alias("n_ckey"),
            cosine(F.col("qv"), F.col("v")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("q_ckey").orderBy(
        F.desc("cosine_sim"), "n_ckey"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_doc", "query_chunk", "neighbor_doc",
            "neighbor_chunk", "cosine_sim", "rank",
        )
    )
