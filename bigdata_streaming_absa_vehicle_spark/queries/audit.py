"""Data-integrity auditing (SURVEY.md §2K extension X-24): a
referential-integrity sweep over every foreign-key edge of the star
schema, and an ORDER-INDEPENDENT mergeable table checksum — the "is the
warehouse internally consistent, and did two pipelines produce the same
table?" primitives every ingest (the reference writes Postgres rows from
streaming batches with no post-hoc verification,
consumer_postgres_streaming.py) needs before anything downstream trusts
the data.

Determinism: all audit outputs are exact integer counts; the checksum is
a SUM of md5-nibble-derived per-row integers — commutative, so identical
for any row order or partitioning, and mergeable across shards/days
(A-14) without rescanning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import query

#: (child table, fk column, parent table, pk column) — every FK edge of
#: the star schema (TPC-H-ish subset the testdata carries).
_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

_NIBBLES = 12  #: checksum keeps md5's first 12 hex nibbles (48 bits/row)

#: per-table canonical row serialization (types pinned: ints/strings as-is,
#: money as exact cents) — the same string feeds md5 in both engines.
_CANON = {
    "region": "CAST(r_regionkey AS {t}) || '|' || r_name",
    "nation": "CAST(n_nationkey AS {t}) || '|' || n_name || '|' "
    "|| CAST(n_regionkey AS {t})",
    "supplier": "CAST(s_suppkey AS {t}) || '|' || s_name || '|' "
    "|| CAST(s_nationkey AS {t}) || '|' "
    "|| CAST(CAST(ROUND(s_acctbal * 100) AS BIGINT) AS {t})",
    "part": "CAST(p_partkey AS {t}) || '|' || p_name || '|' || p_brand || '|' "
    "|| p_type || '|' || CAST(p_size AS {t}) || '|' "
    "|| CAST(CAST(ROUND(p_retailprice * 100) AS BIGINT) AS {t})",
}


def _nibble_int(hex_col: str, n: int = _NIBBLES) -> str:
    """SQL (valid in Spark AND DuckDB) turning the first `n` hex nibbles of
    `hex_col` into an integer — the portable hex->int both engines lack as
    a shared builtin."""
    terms = [
        f"CAST(instr('0123456789abcdef', substr({hex_col}, {i + 1}, 1)) - 1 "
        f"AS BIGINT) * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


def _edge_oracle(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{child}.{fk}' AS edge,
           (SELECT COUNT(*) FROM {child}) AS child_rows,
           (SELECT COUNT(*) FROM {child} WHERE {fk} IS NULL) AS null_fk,
           (SELECT COUNT(DISTINCT {fk}) FROM {child}) AS distinct_fk,
           (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT)
            FROM (SELECT {fk} AS k, COUNT(*) AS cnt FROM {child}
                  WHERE {fk} IS NOT NULL GROUP BY 1) c
            WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.k)
           ) AS orphan_rows
    """


@query(
    "q159_referential_integrity",
    oracle=" UNION ALL ".join(_edge_oracle(*e) for e in _FK_EDGES)
    + " ORDER BY edge",
    tags=("X-24", "J-06", "A-04"),
)
def q159_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep: for every FK edge of the schema,
    child row count, NULL-FK count, distinct FK count, and the number of
    child rows whose FK has NO matching parent (orphans) — the
    constraint check a lakehouse has to run itself because parquet
    enforces nothing. One row per edge; a healthy warehouse reads
    orphan_rows = 0 down the column.

    Scale shape: per edge, the child scan is COLUMN-PRUNED to the single
    FK column and reduced map-side to (key, cnt) BEFORE the existence
    probe, so the anti join moves one row per distinct key, not per
    child row; dimension-sized parents broadcast. The 7 per-edge
    single-row summaries union into a bounded relation."""
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent)
        stats = c.agg(
            F.count(F.lit(1)).alias("child_rows"),
            F.count(F.when(F.col(fk).isNull(), 1)).alias("null_fk"),
            F.countDistinct(fk).alias("distinct_fk"),
        )
        keyed = (
            c.filter(F.col(fk).isNotNull()).groupBy(F.col(fk).alias("k")).count()
        )
        orphans = (
            keyed.join(p.select(F.col(pk).alias("k")), "k", "left_anti")
            .agg(F.coalesce(F.sum("count"), F.lit(0)).cast("long").alias("orphan_rows"))
        )
        parts.append(
            stats.crossJoin(F.broadcast(orphans)).select(
                F.lit(f"{child}.{fk}").alias("edge"),
                "child_rows",
                "null_fk",
                "distinct_fk",
                "orphan_rows",
            )
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionAll(q)
    return out.orderBy("edge")


@query(
    "q164_table_checksum",
    oracle=" UNION ALL ".join(
        f"""
    SELECT '{t}' AS table_name, COUNT(*) AS n_rows,
           CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)
               AS checksum
    FROM (SELECT {_nibble_int(f"md5({_CANON[t].format(t='VARCHAR')})")} AS h
          FROM {t})
    """
        for t in sorted(_CANON)
    )
    + " ORDER BY table_name",
    tags=("X-24", "A-14", "F-08"),
)
def q164_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint: each row serializes to a
    canonical string (types pinned — ints/strings verbatim, money as
    exact cents), hashes to a 48-bit integer (md5's first 12 nibbles),
    and the table checksum is the exact-decimal SUM of row hashes plus
    the row count. Two pipelines produced the same table iff (n_rows,
    checksum) agree — no sort, no row order, no partition layout in the
    contract. The audit primitive behind "did the migration/backfill
    change anything?".

    Scale shape: pure map-side codegen per row, ONE ungrouped map-side-
    combined agg per table — two numbers cross each exchange, and
    because SUM is commutative-mergeable (A-14) per-shard checksums
    roll up without rescanning history. decimal(38,0) accumulation
    holds 2^48-per-row hashes beyond 1e12 rows."""
    parts = []
    for t in sorted(_CANON):
        df = load(spark, sf_dir, t)
        h = F.expr(_nibble_int(f"md5({_CANON[t].format(t='string')})"))
        parts.append(
            df.select(h.cast("decimal(38,0)").alias("h")).agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("h").cast("decimal(38,0)").cast("string").alias("checksum"),
            ).select(F.lit(t).alias("table_name"), "n_rows", "checksum")
        )
    out = parts[0]
    for q in parts[1:]:
        out = out.unionAll(q)
    return out.orderBy("table_name")
