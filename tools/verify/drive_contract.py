"""Drive the driver contract end-to-end: every queries() entry vs its
oracle_sql() in DuckDB at sf0.01, order-insensitive value-hash compare."""
import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        parts = []
        for v in t:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                parts.append("<null>")
            elif isinstance(v, float):
                parts.append(f"{round(v, 6):.6f}")
            elif hasattr(v, "isoformat"):
                parts.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                parts.append(str(list(v)))
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), cols, len(rows)


def main(use_vanilla: bool):
    import __spark_entry__ as E

    if use_vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .appName("verify-vanilla")
            .getOrCreate()
        )
    else:
        from bigdata_streaming_absa_vehicle_spark.session import get_spark

        spark = get_spark("verify")

    ent = E.entry(spark)
    rows = ent.collect()
    print(f"entry: {len(rows)} rows, schema={[f.name for f in ent.schema.fields]}")
    assert len(rows) >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    only = sys.argv[1:] or None
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF).toPandas()
        except Exception as e:
            bad.append((name, f"SPARK ERR {e}"))
            print(f"MISMATCH {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            bad.append((name, f"ORACLE ERR {e}"))
            print(f"MISMATCH {name}: oracle error {str(e)[:200]}")
            continue
        gh, gc, gn = canon(got)
        eh, ec, en = canon(exp)
        if gn != en or gc != ec or gh != eh:
            bad.append((name, f"rows {gn} vs {en}, cols {gc == ec}, hash {gh == eh}"))
            print(f"MISMATCH {name}: rows {gn}/{en} cols_match={gc == ec} hash_match={gh == eh}")
    print(f"checked {len(qs) if not only else len(only)} queries")
    if bad:
        print("FAILURES:", bad)
        sys.exit(1)
    print("ALL MATCH")
    spark.stop()


if __name__ == "__main__":
    main(use_vanilla=False)
