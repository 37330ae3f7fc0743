"""Distributed BPE tokenizer training (north-star §2.2 "token
counting … the input to tokenizer training" taken to its conclusion —
the ceres reference has no text surface at all; SURVEY.md §2).

Byte-pair-encoding merge learning à la Sennrich et al. 2016 (ACL,
"Neural Machine Translation of Rare Words with Subword Units" — the
public `subword-nmt` algorithm): start from characters, repeatedly
merge the most frequent adjacent symbol pair. The classic formulation
already contains the distribution trick this module leans on: merges
are learned over the **weighted word vocabulary**, not the running
corpus text. The 100 TB corpus is therefore touched EXACTLY ONCE (one
word-count shuffle with map-side combine); every one of the M merge
rounds operates on the vocabulary table — millions of rows at web
scale, not billions — so the per-round cost is a vocabulary-sized
pair-count aggregate plus a vocabulary-sized map. No round ever
re-reads or re-shuffles the corpus.

Per-round plan (all JVM-side, zero Python in the data path):
- pair counts: one `explode(zip_with(slice, slice))` over the symbol
  arrays, `groupBy(pair).sum(weight)` — partial aggregation means the
  exchange carries distinct pairs per task;
- argmax: deterministic total order (count DESC, pair ASC) via
  `orderBy().limit(1)` — a 1-row TakeOrderedAndProject, not a sort;
- merge application: a pure SQL `aggregate()` fold over each symbol
  array (greedy left-to-right, non-overlapping — bit-equal to the
  reference implementation's regex replace), then `localCheckpoint`
  to truncate the M-round lineage exactly like
  :func:`ceres_spark.operators.graph.connected_components`.

Determinism: weights are exact BIGINTs and the tie-break is total,
so the learned merge table is partitioning- and engine-independent
(pytest pins it against a pure-Python reference implementation on
random corpora; see tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ceres_spark.operators.text import tokens

#: end-of-word sentinel (Sennrich's `</w>`): keeps merges from
#: crossing word boundaries and lets the tokenizer distinguish
#: "low</w>" from the prefix "low" of "lowest".
EOW = "</w>"


def word_vocab(docs: DataFrame) -> DataFrame:
    """The ONE corpus pass: whitespace-lowercase word counts.

    Returns ``word, weight, syms`` where ``syms`` is the initial
    character-level symbol array with the ``</w>`` sentinel appended.
    """
    return (
        docs.select(F.explode(tokens()).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("weight"))
        .withColumn(
            "syms",
            F.concat(
                F.expr("filter(split(word, ''), s -> s != '')"),
                F.array(F.lit(EOW)),
            ),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol arrays.

    Overlapping occurrences count individually ("aaa" contributes
    (a,a) twice) — same as the reference implementation's get_stats.
    """
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(
            "weight",
            F.explode(
                F.zip_with(
                    F.expr("slice(syms, 1, size(syms) - 1)"),
                    F.expr("slice(syms, 2, size(syms) - 1)"),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("pg"),
        )
        .groupBy("pg.l", "pg.r")
        .agg(F.sum("weight").alias("pair_count"))
    )


def _merge_expr(left: str, right: str) -> F.Column:
    """SQL fold applying merge (left, right) → left||right greedily
    left-to-right without overlap: state = (emitted prefix, carried
    symbol); a carried ``left`` followed by ``right`` emits the merged
    token and clears the carry, so "aaa" under (a,a) becomes [aa, a].
    """
    return F.expr(
        """
        aggregate(
          syms,
          named_struct('out', cast(array() as array<string>),
                       'carry', cast(null as string)),
          (acc, x) -> case
            when acc.carry is null
              then named_struct('out', acc.out,
                                'carry', cast(x as string))
            when acc.carry = {L} and x = {R}
              then named_struct('out',
                                concat(acc.out, array({L} || {R})),
                                'carry', cast(null as string))
            else named_struct('out',
                              concat(acc.out, array(acc.carry)),
                              'carry', cast(x as string))
          end,
          acc -> case when acc.carry is null then acc.out
                      else concat(acc.out, array(acc.carry)) end
        )
        """.format(L=_sql_str(left), R=_sql_str(right))
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _learn_local(
    weighted: list[tuple[tuple[str, ...], int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Exact merge learning on a driver-resident weighted vocabulary —
    the same algorithm the distributed loop runs, O(V·len·M)."""
    vocab = dict(weighted)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < 2:
            break
        merges.append((rank, left, right, cnt))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 16,
    vocab_cap: int = 262144,
    vocab_partitions: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over ``docs.text``.

    Returns one row per learned merge: ``rank`` (1-based order),
    ``left``, ``right``, ``merged``, ``pair_count`` (the weighted
    corpus count that won the round). Stops early (fewer rows) when
    no pair occurs twice — merging hapax pairs is never useful and
    keeps the output corpus-size-independent for toy inputs.

    Two regimes behind one deterministic algorithm (both paths are
    bit-equal, pytest-pinned):

    - **vocabulary ≤ vocab_cap** (the common case even at 100 TB —
      the corpus pass reduces to DISTINCT WORDS, and natural-language
      vocabularies are millions, not billions): collect the weighted
      vocabulary (a bounded, corpus-size-independent table — the same
      contract as IVF's bounded-sample centroid training) and learn
      merges driver-side with zero per-round jobs. The 100 TB of
      text still flows through exactly one distributed word-count.
    - **vocabulary > vocab_cap** (byte-soup / adversarial corpora):
      per-round distributed pair-count + fold-merge, vocabulary-sized
      shuffles only, lineage truncated by periodic localCheckpoint.

    ``vocab_partitions`` sizes the distributed rounds' jobs — dial up
    when the vocabulary is genuinely huge.
    """
    base = word_vocab(docs).select("weight", "syms")
    spark = docs.sparkSession
    # one corpus pass: over-fetch by one row to detect cap overflow
    # without a separate count job (the fetch is bounded either way)
    probe = base.limit(int(vocab_cap) + 1).collect() if vocab_cap else []
    if vocab_cap and len(probe) <= int(vocab_cap):
        weighted = [
            (tuple(r["syms"]), int(r["weight"])) for r in probe
        ]
        merges = _learn_local(weighted, int(n_merges))
    else:
        vocab = (
            base.repartition(vocab_partitions).localCheckpoint(eager=True)
        )
        merges = []
        for rank in range(1, int(n_merges) + 1):
            best = (
                _pair_counts(vocab)
                .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["pair_count"] < 2:
                break
            left, right, cnt = (
                best[0]["l"],
                best[0]["r"],
                best[0]["pair_count"],
            )
            merges.append((rank, left, right, cnt))
            vocab = vocab.withColumn("syms", _merge_expr(left, right))
            if rank % 4 == 0 or rank == int(n_merges):
                vocab = vocab.localCheckpoint(eager=True)
    from ceres_spark.sources.tables import local_rows

    return local_rows(
        spark,
        [
            (rank, left, right, left + right, int(cnt))
            for rank, left, right, cnt in merges
        ],
        "rank int, left string, right string, merged string, pair_count long",
    )


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list to ``docs`` — the inference side:
    per-doc BPE token count and distinct-token count. Pure map over
    the corpus (the merge list is a closed-over constant folded into
    the plan as M chained `aggregate()` passes — no join, no shuffle
    until the final per-doc aggregate, which is a select).
    """
    out = docs.withColumn(
        "syms",
        F.expr(
            "flatten(transform(filter(split(lower(text), ' '), "
            "w -> w != ''), w -> concat(filter(split(w, ''), "
            "s -> s != ''), array('" + EOW + "'))))"
        ),
    )
    for left, right in merges:
        out = out.withColumn("syms", _merge_expr(left, right))
    return out.select(
        "doc_id",
        F.size("syms").alias("n_bpe_tokens"),
        F.size(F.array_distinct("syms")).alias("n_distinct_bpe_tokens"),
    )
