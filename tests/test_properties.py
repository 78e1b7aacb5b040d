"""Hypothesis property tests — invariants that single fixed-input checks
can't establish: salting never changes join results, the rolling fingerprint
is incrementally extendable, quantized cosine stays within its error bound,
and the deterministic-sum helpers are permutation-invariant.

Spark-side properties run each case through the live session on purpose-built
tiny frames; generators are sized so the whole module stays in seconds.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_streaming_absa_vehicle_spark.operators.text_analysis import RH_BASE, RH_MOD

SLOW = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


def rolling_py(tokens: list[int]) -> int:
    """Pure-python twin of rolling_fingerprint's fold (over pre-hashed ints)."""
    acc = 0
    for h in tokens:
        acc = (acc * RH_BASE + h % RH_MOD) % RH_MOD
    return acc


@given(st.lists(st.integers(min_value=0, max_value=2**60), max_size=50))
@settings(max_examples=200, deadline=None)
def test_rolling_fingerprint_is_incremental(hashes):
    """Appending one token = one more fold step — the property that lets a
    chunked reader extend the fingerprint without rereading the document."""
    full = rolling_py(hashes)
    prefix = rolling_py(hashes[:-1]) if hashes else 0
    if hashes:
        assert full == (prefix * RH_BASE + hashes[-1] % RH_MOD) % RH_MOD
    assert 0 <= full < RH_MOD


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.floats(-1e6, 1e6, allow_nan=False)), max_size=30
    )
)
@settings(max_examples=50, deadline=None)
def test_decimal_sum_is_permutation_invariant(rows):
    """The dsum contract, checked on its arithmetic core: summing cents as
    exact integers is order-independent where float summation is not."""
    cents = [int(math.copysign(math.floor(abs(v) * 100 + 0.5), v)) for _, v in rows]
    assert sum(cents) == sum(reversed(cents))


@SLOW
@given(st.integers(min_value=2, max_value=4), st.integers(min_value=0, max_value=10**6))
def test_salted_join_equals_plain_join(spark, n_salts, seed):
    """salted_join must be result-identical to the plain join for any salt
    count, including fact rows with no dim match (inner drops them) and
    skewed key distributions."""
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.queries.joins import salted_join

    fact = spark.range(40).select(
        (F.col("id") % 7 + (seed % 3)).alias("k"), (F.col("id") * 10).alias("v")
    )
    dim = spark.range(5).select(F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("name"))
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, "k", n_salts=n_salts).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_quantized_cosine_error_bound(spark, seed):
    """|quantized cosine - true cosine| stays within a generous dim-scaled
    2^-20 bound (per-component quantization error <= 2^-21; products
    accumulate across the dim)."""
    import numpy as np

    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.operators.similarity import (
        Q_SCALE,
        Q_SCALE_SQ,
        quantized_unit_vec,
    )

    rng = np.random.default_rng(seed)
    a = rng.normal(size=16).tolist()
    b = rng.normal(size=16).tolist()
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    row = df.select(
        quantized_unit_vec(F.col("a")).alias("qa"), quantized_unit_vec(F.col("b")).alias("qb")
    ).collect()[0]
    qcos = float(np.dot(np.array(row.qa), np.array(row.qb))) / Q_SCALE_SQ
    true = float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    )
    assert abs(qcos - true) <= 20 * 16 / Q_SCALE, f"qcos={qcos} true={true}"


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_quantized_batched_equals_hof(spark, seed):
    """The Arrow-batched quantizer must be BIT-identical to the interpreted
    HOF column for arbitrary vectors — the property that keeps the numpy
    fast path and the DuckDB oracle in lockstep (cumsum = sequential fold)."""
    import numpy as np

    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.operators.similarity import (
        quantized_batched,
        quantized_unit_vec,
    )

    rng = np.random.default_rng(seed)
    rows = [
        (i, (rng.normal(size=64) * 10.0 ** float(rng.integers(-3, 4))).tolist())
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    hof = {
        r.vec_id: list(r.qv)
        for r in df.select(
            "vec_id", quantized_unit_vec(F.col("embedding")).alias("qv")
        ).collect()
    }
    batched = {r.vec_id: list(r.qv) for r in quantized_batched(df).collect()}
    assert hof == batched


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_bucketed_batched_equals_hof(spark, seed):
    """LSH bucket assignment: the batched cumsum plane dots must reproduce the
    interpreted bucket_columns HOF exactly, sign-borderline cases included."""
    import numpy as np

    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.operators.similarity import (
        bucket_columns,
        bucketed_batched,
        plane_weights,
    )

    rng = np.random.default_rng(seed)
    rows = [(i, rng.normal(size=64).tolist()) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    weights = plane_weights()
    hof = {
        r.vec_id: tuple(r[f"bucket_{t}"] for t in range(len(weights)))
        for r in df.select(
            "vec_id", *bucket_columns(F.col("embedding"), weights)
        ).collect()
    }
    batched = {
        r.vec_id: tuple(r[f"bucket_{t}"] for t in range(len(weights)))
        for r in bucketed_batched(df, "vec_id", "vec_id", "embedding", "vec", weights).collect()
    }
    assert hof == batched


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_minhash_fused_equals_hof(spark, seed):
    """The fused tokenize->shingle->signature Arrow pass must agree with the
    pure-expression pipeline (tokens -> shingles -> minhash_signature) on
    both the shingle SET and the signature, for texts with irregular
    whitespace."""
    import random as pyrandom

    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.operators.dedup import (
        minhash_signature,
        shingle_sigs_batched,
        shingles,
        tokens,
    )

    rng = pyrandom.Random(seed)
    words = ["alpha", "beta", "gamma", "delta", "x", "yy"]
    texts = []
    for i in range(6):
        n = rng.randint(0, 8)
        sep = rng.choice([" ", "  ", "\t", " \t "])
        texts.append((i, sep.join(rng.choice(words) for _ in range(n)) + rng.choice(["", " ", "  "])))
    df = spark.createDataFrame(texts, "doc_id long, text string")
    base = (
        df.select(F.col("doc_id").alias("doc_id_"), tokens("text").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id_", F.array_distinct(shingles(F.col("toks"), 3)).alias("sh_set"))
    )
    hof = {
        r.doc_id_: (frozenset(r.sh_set), tuple(r.sig))
        for r in base.select(
            "doc_id_", "sh_set", minhash_signature(F.col("sh_set")).alias("sig")
        ).collect()
    }
    fused = {
        r.doc_id_: (frozenset(r.sh_set), tuple(r.sig_arr))
        for r in shingle_sigs_batched(df).collect()
    }
    assert hof == fused


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_asof_join_equals_naive_range_formulation(spark, seed):
    """The one-shuffle tagged-union as-of join must equal the naive
    range-join + keep-latest formulation for arbitrary tie/no-match
    layouts — including right rows at exactly the left timestamp (<=
    semantics) and left rows before any right row (null payload)."""
    import random as pyrandom

    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.operators.asof import asof_join

    rng = pyrandom.Random(seed)
    lrows = [(i, rng.randint(0, 3), rng.randint(0, 20)) for i in range(25)]
    rrows = {(rng.randint(0, 3), rng.randint(0, 20)): None for _ in range(12)}
    rrows = [(k, t, float(k * 100 + t)) for (k, t) in rrows]
    left = spark.createDataFrame(lrows, "event_id long, k long, t long")
    right = spark.createDataFrame(rrows, "k long, rt long, price double")

    got = {
        r.event_id: r.price
        for r in asof_join(left, right, "k", "t", "rt", ["price"]).collect()
    }

    naive = (
        left.join(right, (left.k == right.k) & (left.t >= right.rt), "left")
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "event_id"
                ).orderBy(F.desc_nulls_last("rt"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    want = {r.event_id: r.price for r in naive.collect()}
    assert got == want


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_interval_join_equals_naive_range_join(spark, seed):
    """The bucketed interval join (explode-to-2-buckets + equi-join +
    BETWEEN post-filter) must produce exactly the naive key-join + range
    filter pair set for arbitrary timestamp layouts — including pairs that
    straddle a bucket boundary and exact-boundary hits (inclusive ends)."""
    import datetime
    import random as pyrandom

    from bigdata_streaming_absa_vehicle_spark.operators.interval import interval_join

    rng = pyrandom.Random(seed)
    t0 = datetime.datetime(2024, 1, 1)

    def ts():
        return t0 + datetime.timedelta(seconds=rng.randint(0, 5000))

    lrows = [(i, rng.randint(0, 3), ts()) for i in range(20)]
    rrows = [(100 + i, rng.randint(0, 3), ts()) for i in range(20)]
    left = spark.createDataFrame(lrows, "lid long, lk long, lt timestamp")
    right = spark.createDataFrame(rrows, "rid long, rk long, rt timestamp")
    lower, upper = -600, 300

    got = {
        (r.lid, r.rid)
        for r in interval_join(
            left, right, "lk", "rk", "lt", "rt", lower_s=lower, upper_s=upper
        ).collect()
    }
    from pyspark.sql import functions as F

    naive = left.join(
        right,
        (F.col("lk") == F.col("rk"))
        & (F.col("rt") >= F.col("lt") + F.expr(f"INTERVAL {lower} SECONDS"))
        & (F.col("rt") <= F.col("lt") + F.expr(f"INTERVAL {upper} SECONDS")),
    )
    want = {(r.lid, r.rid) for r in naive.collect()}
    assert got == want


def test_asof_join_rejects_column_collisions(spark):
    """value_cols colliding with an existing left column must raise instead
    of silently nulling the left column out (ADVICE r2)."""
    import pytest

    from bigdata_streaming_absa_vehicle_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 0, 1.0)], "event_id long, t long, price double")
    right = spark.createDataFrame([(0, 0, 2.0)], "k long, rt long, price double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumnRenamed("event_id", "k"), right, "k", "t", "rt", ["price"])
    left2 = spark.createDataFrame([(1, 0, 7)], "k long, t long, _side long")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left2, right, "k", "t", "rt", [])


def test_quantized_batched_rejects_zero_vector(spark):
    """A zero-norm embedding has no cosine direction; the batched kernel
    must fail loudly (ADVICE r2) instead of emitting INT64_MIN garbage."""
    import pytest

    from bigdata_streaming_absa_vehicle_spark.operators.similarity import quantized_batched

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, 2.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="zero-norm"):
        quantized_batched(df).collect()


def test_shingle_kernels_drop_null_text(spark):
    """NULL documents must be dropped (the JVM twin's size(tokens) >= k
    filter drops them), not crash the Arrow task (ADVICE r2)."""
    from bigdata_streaming_absa_vehicle_spark.operators.dedup import (
        shingle_hashes_batched,
        shingle_sigs_batched,
        shingle_simhash_batched,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, None), (3, "x")],
        "doc_id long, text string",
    )
    assert [r[0] for r in shingle_sigs_batched(df).collect()] == [1]
    assert [r[0] for r in shingle_simhash_batched(df).collect()] == [1]
    assert [r[0] for r in shingle_hashes_batched(df).collect()] == [1]


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_banded_neardup_recall_on_planted_duplicates(spark, seed):
    """q44b recall contract (r2 verdict item): with 4 bands x 6 bits, a
    planted near-duplicate at cosine ~0.995 (angle ~6 deg) shares a band
    with probability ~1 - (1 - (1 - 6/180)^6)^4 ~ 0.99; over 8 planted
    pairs per case and 10 cases, demand >= 70% recall per case (a lenient
    floor far above the ~2% band-collision rate of random 64-dim vectors)
    and, always, banded pairs must be a SUBSET of the exact all-pairs
    result at the same threshold (band pruning can only drop, never add)."""
    import numpy as np

    from bigdata_streaming_absa_vehicle_spark.operators.similarity import (
        banded_neardup_pairs,
        quantized_neardup_pairs,
    )

    rng = np.random.default_rng(seed)
    base = rng.normal(size=(8, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # planted twin i+100: perturbation with expected norm 0.02*sqrt(64)=0.16
    # against a unit base => cosine ~ 1/sqrt(1+0.16^2) ~ 0.987 (angle ~9 deg,
    # per-band collision ~0.73, any-of-4 ~0.99)
    twins = base + rng.normal(size=base.shape) * 0.02
    rows = [(i, base[i].tolist()) for i in range(8)] + [
        (100 + i, twins[i].tolist()) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r.vec_a, r.vec_b)
        for r in quantized_neardup_pairs(df, threshold=0.9).collect()
    }
    banded = {
        (r.vec_a, r.vec_b)
        for r in banded_neardup_pairs(df, threshold=0.9).collect()
    }
    assert banded <= exact, f"band pruning ADDED pairs: {sorted(banded - exact)}"
    planted = {(i, 100 + i) for i in range(8)} & exact
    if planted:
        recall = len(banded & planted) / len(planted)
        assert recall >= 0.7, (
            f"banded recall {recall:.2f} on {len(planted)} planted pairs"
        )


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_connected_components_equals_union_find(spark, seed):
    """Min-label propagation must produce exactly the min-id-per-component
    labeling of a reference union-find, for arbitrary random graphs —
    including isolated nodes, self-loops dropped, and multi-hop chains
    (the convergence-loop case a single propagation round would miss)."""
    import random as pyrandom

    from bigdata_streaming_absa_vehicle_spark.operators.components import (
        connected_components,
    )

    rng = pyrandom.Random(seed)
    n = 20
    edges = [(rng.randint(0, n - 1), rng.randint(0, n - 1)) for _ in range(12)]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    got = {
        r.id: r.component
        for r in connected_components(nodes, edf, "id", "src", "dst").collect()
    }
    assert got == want


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_funnel_window_equals_naive_join_formulation(spark, seed):
    """q86's single-window-scan funnel must equal the naive join/EXISTS
    formulation for arbitrary event layouts — including exact-timestamp
    ties, where the window's (ts, event_id) ROWS frame means 'the view row
    precedes the click row in the total order'."""
    import datetime
    import random as pyrandom

    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.queries.analytics import funnel_per_user

    rng = pyrandom.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "other"]
    rows = [
        (
            i,
            rng.randint(0, 2),
            base + datetime.timedelta(minutes=rng.randint(0, 120)),
            types[rng.randint(0, 3)],
        )
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r.user_id: (r.s1, r.s2, r.s3) for r in funnel_per_user(ev, 30).collect()
    }

    # naive: qualified click = EXISTS view preceding in (ts, event_id) order
    # within 30 min; completion = EXISTS qualified click preceding within 30
    # min of the purchase
    gap = datetime.timedelta(minutes=30)
    by_user: dict[int, list] = {}
    for eid, uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    want = {}
    for uid, evs in by_user.items():
        evs.sort()
        s1 = any(et == "view" for _, _, et in evs)
        qclicks = []
        for ts, eid, et in evs:
            if et == "click":
                if any(
                    vet == "view" and (vts, veid) < (ts, eid) and ts <= vts + gap
                    for vts, veid, vet in evs
                ):
                    qclicks.append((ts, eid))
        s3 = any(
            et == "purchase"
            and any((qts, qeid) < (ts, eid) and ts <= qts + gap for qts, qeid in qclicks)
            for ts, eid, et in evs
        )
        want[uid] = (int(s1), int(bool(qclicks)), int(s3))
    assert got == want


@SLOW
@given(st.integers(min_value=0, max_value=10**9))
def test_sessionize_equals_python_simulation(spark, seed):
    """q91's gaps-and-islands sessionization must equal a direct per-user
    scan for arbitrary gap layouts (incl. exact-timestamp ties and events
    exactly at the 30-minute boundary, which stay in-session: <=)."""
    import datetime
    import random as pyrandom

    from bigdata_streaming_absa_vehicle_spark.queries.analytics import sessionize_events

    rng = pyrandom.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            i,
            rng.randint(0, 2),
            base + datetime.timedelta(minutes=rng.choice([0, 5, 30, 31, 60, 95, 180])),
        )
        for i in range(30)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start, r.duration_us)
        for r in sessionize_events(ev, 30).collect()
    }

    gap = datetime.timedelta(minutes=30)
    by_user: dict[int, list] = {}
    for eid, uid, ts in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    want = {}
    for uid, evs in by_user.items():
        evs.sort()
        idx = 0
        sessions: list[list] = []
        for j, (ts, eid) in enumerate(evs):
            if j == 0 or ts > evs[j - 1][0] + gap:
                idx += 1
                sessions.append([])
            sessions[-1].append(ts)
        for k, sess in enumerate(sessions, start=1):
            dur = int((sess[-1] - sess[0]).total_seconds() * 1_000_000)
            want[(uid, k)] = (len(sess), sess[0], dur)
    assert got == want


def test_dsum_davg_bitwise_invariant_across_partition_layouts(spark):
    """The 100 TB merge contract on the LIVE engine path: dsum/davg must
    produce bit-identical doubles no matter how rows are partitioned —
    Spark merges partial aggregates in nondeterministic order, so a plain
    sum(double) fails this; the decimal detour must not. Values are chosen
    to be float-summation-hostile (irrational-step pattern, mixed signs)."""
    from bigdata_streaming_absa_vehicle_spark.functions.deterministic import davg, dsum

    data = [
        (i % 5, ((-1) ** i) * (((i * 2654435761) % 1000003) / 97.0))
        for i in range(4000)
    ]
    df = spark.createDataFrame(data, "k int, v double")
    outs = []
    for parts in (1, 7, 32):
        rows = (
            df.repartition(parts, "v")
            .groupBy("k")
            .agg(dsum("v").alias("s"), davg("v").alias("a"))
            .orderBy("k")
            .collect()
        )
        outs.append([(r["k"], float(r["s"]).hex(), float(r["a"]).hex()) for r in rows])
    assert outs[0] == outs[1] == outs[2]


def test_representative_queries_invariant_to_aqe_toggle(spark):
    """AQE rewrites physical plans at runtime (coalesced shuffles, demoted
    broadcasts, skew splits) — results must not depend on it. One
    representative query per physical family: hash agg, multi-join,
    window, Arrow mapInPandas kernel, global sort."""
    import math

    from bigdata_streaming_absa_vehicle_spark.queries import all_queries

    names = (
        "q09_pricing_summary",      # hash aggregate
        "q17_star_join",            # broadcast/shuffle join mix
        "q23w_running_sum",         # window
        "q406_pixel_decode",        # Arrow mapInPandas chain
        "q14_global_sort",          # range-partitioned sort
    )
    specs = all_queries()
    sf = "/root/testdata/sf0.001"

    def canon(df):
        rows = []
        for t in df.collect():
            parts = []
            for v in t:
                if isinstance(v, float):
                    parts.append("nan" if math.isnan(v) else float(v).hex())
                else:
                    parts.append(str(v))
            rows.append("|".join(parts))
        return sorted(rows)

    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        results = {}
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            results[aqe] = {n: canon(specs[n].fn(spark, sf)) for n in names}
        for n in names:
            assert results["true"][n] == results["false"][n], n
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)
