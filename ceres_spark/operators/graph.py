"""Distributed connected components — transitive closure of the
pairwise near-dup relation.

Pairwise detectors (jaccard/minhash/simhash/embedding, dedup.py &
similarity.py) emit EDGES; corpus dedup needs CLUSTERS: if A~B and
B~C, all three are one duplicate group even when A~C is below
threshold. Not in the ceres reference (no relational surface at all,
SURVEY.md §2) — this is the north-star training-pipeline step that
turns near-dup pairs into a keep/drop decision.

Algorithm: iterative min-label propagation. Every node starts
labelled with itself; each round it adopts the minimum label among
itself and its neighbours; fixpoint = every node carries the minimum
node id of its component (a unique, deterministic labelling —
independent of partitioning and join order).

Scale notes:
- each round is one shuffled join (edges ⋈ labels on node) + a
  map-side-combinable min aggregation — no windows, no collect; edge
  and label partitioning is stable across rounds so AQE reuses
  exchange layouts.
- rounds = graph diameter. Near-dup graphs are dense blobs (diameter
  2-4), so this beats the constant-factor-heavier large-star/
  small-star contraction (O(log²) rounds) that would win on long
  chains; swap in star-contraction if a workload ever feeds this
  high-diameter graphs.
- `localCheckpoint` truncates the growing lineage each round —
  without it, round N replans rounds 1..N-1 (quadratic planning). On
  a real cluster with an HA requirement use `checkpoint()` to a
  replicated dir instead; localCheckpoint trades re-computability
  for speed, which is right for a deterministic rerunnable job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it.

    Returns ``node, comp`` for every node that appears in an edge
    (callers union in singletons). Raises if ``max_iter`` rounds don't
    reach the fixpoint — a wrong-but-plausible labelling must never
    be silently returned.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    def label_sum(df: DataFrame) -> int:
        # labels only ever DECREASE, so Σcomp strictly decreases iff
        # any label changed — one cheap aggregate replaces a
        # join+filter+count convergence probe (decimal: immune to
        # int64 overflow at billion-node × large-id scale)
        return df.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = label_sum(labels)
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("_nbr_comp"))
        )
        new_labels = (
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"),
                    F.coalesce(F.col("_nbr_comp"), F.col("comp")),
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
