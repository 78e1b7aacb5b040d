"""Connected components over a pair relation (SURVEY.md §2K X-02 extension):
turn near-duplicate PAIRS into duplicate CLUSTERS and elect one canonical
document per cluster — the step between "q41 found similar pairs" and "drop
the copies from the training set".

Algorithm: synchronous min-label propagation (the BSP formulation every
distributed graph engine bottoms out in): every node starts labeled with its
own id; each round, a node adopts the minimum label among itself and its
neighbors; fixpoint = every node carries the minimum node id of its
component. Rounds = one shuffle each (edge join + min-aggregate on node id),
and the driver sees only a single converged? scalar per round — no vertex
data ever leaves the executors. Label state is eagerly localCheckpoint-ed
each round to cut the exponential lineage an iterative join would otherwise
build.

Scale notes: near-dup graphs are overwhelmingly tiny star/clique clusters
(diameter 2-3), so propagation converges in ~3 rounds regardless of corpus
size; the worst case is O(diameter) rounds of one shuffle each. For
adversarial long-path graphs the literature's large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond") drops that
to O(log d) rounds at the cost of two exchanges per round — with bounded
cluster diameter the simpler kernel wins, which is why it is the default
here. The oracle is a DuckDB recursive CTE over the same pair relation, so
the fixpoint semantics are pinned, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 30,
) -> DataFrame:
    """(id, component): component = min node id reachable from `id` over the
    undirected edge set. Nodes with no edges keep their own id. Raises if the
    propagation has not converged after max_rounds (a correctness guard —
    an unconverged labeling is NOT a component assignment)."""
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()  # reused every round: compute the edge prep once
    )
    lab = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    for _ in range(max_rounds):
        # min neighbor label per node, one shuffle on the node id
        cand = (
            sym.join(lab, sym["v"] == lab["id"])
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        new = (
            lab.join(cand, lab["id"] == cand["u"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_chg"),
            )
        )
        new = new.localCheckpoint()  # eager: breaks per-round lineage growth
        changed = new.filter(F.col("_chg")).limit(1).count()
        lab = new.drop("_chg")
        if changed == 0:
            return lab
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "component diameter exceeds the round budget; raise max_rounds"
    )


def oracle_components_sql(pairs_cte: str) -> str:
    """DuckDB recursive-CTE twin: min reachable id per node over the pair
    relation produced by `pairs_cte` (must SELECT doc_a, doc_b)."""
    return f"""
    WITH RECURSIVE pairs AS ({pairs_cte}),
    sym AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, r) AS (
        SELECT u, u FROM (SELECT u FROM sym UNION SELECT v FROM sym)
        UNION
        SELECT sym.u, reach.r FROM sym JOIN reach ON sym.v = reach.u
    )
    SELECT u AS id, MIN(r) AS component FROM reach GROUP BY u
    """
