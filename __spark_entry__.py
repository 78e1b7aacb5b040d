"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(`bigdata_streaming_absa_vehicle_spark.queries`): every declared operator from
SURVEY.md §2 is one registry entry bundling the PySpark implementation with
its DuckDB oracle SQL, so `queries()` and `oracle_sql()` stay in lockstep by
construction.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_streaming_absa_vehicle_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    spec = all_queries()["q09_pricing_summary"]
    return spec.fn(spark, "/root/testdata/sf0.001")


# The driver's correctness harness checks the FIRST 50 entries of queries()
# in dict order, so this priority list IS the rotation policy.  Rotation
# history (so full-coverage evidence can be reconstructed without git
# archaeology):
#   - Round 1 (CORRECTNESS_r01.json): registry insertion order[0:50] — the
#     relational/join/scalar surface q01-q42.  15 ERR'd on the events-nanos
#     harness bug (fixed in tables.load); the rest green.
#   - Round 2 (CORRECTNESS_r02.json): front-loaded the 15 round-1-ERR
#     queries + the 24 never-checked LLM-pipeline/inference/window-twin/UDF
#     queries (q42b-q69) + the 5 new operators (q72-q76) + 5 proven
#     flagships.  All 50 green; the 30 round-1-green relational queries sat
#     past the window on their r01 evidence.
#   - Round 3 (CORRECTNESS_r03.json): rotated the 30 round-1-green queries
#     back in (all green again) + first-ever rows for q77-q96.  The sandbox
#     Spark upgrade to 4.1.2 broke the events loader mid-round, so the 10
#     events-based entries ERR'd and the round-3 bench crashed — fixed in
#     tables._canonical_timestamps (dtype-branching loader).
#   - Round 4 (CORRECTNESS_r04.json): tiered re-certification on the fixed
#     loader — 14 never-certified + 23 stale-events re-certs + 13 oldest
#     pytest-only; all 50 green.  With the still-valid r1-r3 rows that gave
#     every pre-round-4 query (q01-q99) driver evidence on the current
#     engine; the 25 round-4 additions (q100-q124) sat past the window.
#   - Round 5 (this file): first-ever rows for q100-q124, same-round
#     certification for the 11 round-5 additions (q125-q135), and the 14
#     oldest r1/r2-evidence rows re-certified — see the tier comments
#     inside _WINDOW_PRIORITY below.
_WINDOW_PRIORITY = (
    # -- Round 5 window.  Tier 1: the 25 round-4 queries (q100-q124) that
    # hold pytest-oracle evidence only and have never had a driver
    # CORRECTNESS row — first-ever driver certification closes the last
    # evidence gap (VERDICT r4 "Next round" item 1). --
    "q100_time_range_window",
    "q101_group_zscore",
    "q102_histogram",
    "q103_equidepth_bins",
    "q104_embed_quantize",
    "q105_bm25",
    "q106_scd2_upsert",
    "q107_tpch_q7_volume_shipping",
    "q108_tpch_q14_promo_revenue",
    "q109_tpch_q19_disjunctive",
    "q110_tpch_q13_order_distribution",
    "q111_tpch_q8_market_share",
    "q112_tpch_q22_global_sales",
    "q113_column_profile",
    "q114_partial_agg_merge",
    "q115_count_min_sketch",
    "q116_zorder_cluster",
    "q117_snapshot_diff",
    "q118_transition_matrix",
    "q119_join_fanout_profile",
    "q120_psi_drift",
    "q121_bpe_pairs",
    "q122_correlation_matrix",
    "q123_resample_ffill",
    "q124_pagerank",
    # -- Tier 2: the 11 queries added in round 5 (TPC-H Q2/Q9/Q12/Q15/Q16/
    # Q21 shapes + the X-16/X-17 training-set operators) — certified in the
    # same round they were written so no new pytest-only backlog forms. --
    "q125_tpch_q2_min_cost_supplier",
    "q126_tpch_q9_product_profit",
    "q127_tpch_q12_priority_class",
    "q128_tpch_q15_top_supplier",
    "q129_tpch_q16_supplier_count",
    "q130_tpch_q21_waiting_supplier",
    "q131_temporal_split",
    "q132_group_hash_split",
    "q133_reservoir_sample_per_key",
    "q134_seq_length_buckets",
    "q135_class_balance_weights",
    # -- Tier 3: the 14 queries whose newest driver rows date from rounds
    # 1-2 (none touch events, so those rows stayed valid across the Spark
    # 4.1.2 upgrade, but they are the oldest evidence in the ledger) —
    # re-certified per the <=3-round evidence-age policy (VERDICT r4 item 9). --
    "q30_json_extract",
    "q42_simhash",
    "q42b_simhash_hamming_pairs",
    "q43_ngram_jaccard_pairs",
    "q44b_banded_neardup",
    "q48_quality_and_tokens",
    "q49_lang_id",
    "q50_fingerprint",
    "q50b_rolling_fingerprint",
    "q53_resize_meta",
    "q70_shipping_priority",
    "q71_returned_item_report",
    "q73_chunking",
    "q74_salient_terms",
)
# Window budget note: 25 + 11 + 14 fill the 50 exactly.  Every query past
# the window holds a green driver row on the current engine from rounds 3-4
# (CORRECTNESS_r03/r04; the round-4 window re-certified every events-touching
# query after the Spark 4.1.2 loader fix), and the pytest oracle suite
# (tests/test_oracle_queries.py) re-hash-checks ALL queries at sf0.01 — the
# driver's own scale — in its default configuration.  If this window comes
# back green, all 140 pre-existing registry queries have driver evidence
# valid for the current environment and no pre-round-5 query's newest
# driver row is older than round 3.  The 40 operators written mid-round-5
# (q136-q158: triangles, fuzzy join, bloom pre-filter, TPC-H Q11/Q20/Q4/
# Q6/Q18, EWMA, MAD outliers, shingle novelty, source overlap, centroid
# cosines, containment, mixing plan, KS drift, point-in-time join,
# changelog compaction, weighted median, last-touch attribution,
# winsorized mean, per-entity OLS trend, training-assembly capstone;
# q159-q169 (no q161): referential-integrity sweep, order-independent
# table checksum, peak-concurrency sweep, TWAP, basket pairs, mutual
# information, A/B z-test, gains table, exact AUC, negative sampling;
# and q170-q186 (no q161): funnel latency, linear attribution, user
# entropy, Benford audit, revenue Gini, rolling 7-day active users,
# degree assortativity, model-version churn/kappa + class shift,
# Kaplan-Meier survival, seasonal load profile + anomaly flags,
# golden-record survivorship, point-in-time state reconstruction,
# bigram PMI, out-of-order watermark-sizing profile, session paths,
# k-anonymity/l-diversity audit, HLL sketch-overlap, A/B minimum
# detectable effect; and q190-q199: compaction planner, incremental
# aggregate maintenance, entity-resolution blocking, half-sample CI,
# Brier calibration decomposition, exact-int64 k-means iterations,
# profile drift, next-event backtest, future-window labels,
# deletion-propagation audit; and q200-q214: HDR mergeable
# quantile sketch, token-budget corpus selection, Adamic-Adar link
# prediction, bigram surprisal, embedding dimension profile, Pareto
# frontier, ABC classification, autocorrelation, Fellegi-Sunter
# match scoring, new-user growth curve, chi-square independence,
# RFM segmentation, time-decay attribution, weighted reservoir,
# cohort LTV curve; q215/q216: spatial cell density + lossless
# cell-bucketed radius join; q217: quality-based cluster
# canonicalization; q218: CMS join-size estimation; q219:
# seasonal-naive forecast backtest; q220: declarative
# expectation-suite audit; q221: Markov stationary distribution;
# q222: diversified top-k; q223: freshness audit; q224:
# column-entropy encoding advisor; q225: pointer-doubling
# forest roots; q226: gaps-and-islands activity streaks; q227:
# bitmap-algebra day-over-day retention; q228: DAU/WAU
# stickiness; q229: funnel-by-experiment-arm; and q230-q232:
# retrieval NDCG@10, per-probe ANN recall@5, k-NN vote accuracy;
# q233: one-way ANOVA seasonality strength; q234: user
# concentration curve; q235: graph degree distribution; q236:
# trigram-prefilter substring search; q237: CUSUM changepoint
# locator; q238: per-pair MinHash estimator accuracy; q239:
# 2-core peeling; q240: sketch-based distribution overlap; q241:
# fulfillment-lag percentiles; q242: inter-purchase interval
# distribution; q243: functional-dependency discovery; q244:
# power-law tail fit; q245: brand-momentum spike detection; q246:
# Lindley capped running balance; q247: interval-union coverage;
# q248: top-k leaderboard rank churn; q249: Theil-Sen robust trend;
# q250: nearest-centroid classifier eval; q251: exact 1-D Wasserstein
# matrix; q252: local clustering coefficient; q253: sorted-neighborhood
# ER candidates; q254: item-item CF neighbors; q255: jackknife
# cluster-robust ratio SE; q256: log-log price elasticity; q257:
# two-sample log-rank test; q258: Simpson's-paradox audit; q259:
# lead-lag cross-correlation; q260: Chapman capture-recapture; q261:
# Goh-Barabasi burstiness; q262: ABC-XYZ inventory matrix; q263:
# empirical-Bayes rate shrinkage; q264: Spearman/Kendall rank
# correlation; q265: Cramér's V association matrix; q266:
# Laspeyres/Paasche/Fisher price index; q267:
# difference-in-differences estimator; q268: label-propagation
# communities; q269: pinball quantile-forecast backtest; q270: Heaps'-law
# vocabulary growth; q271: Apriori frequent triples + rules; q272:
# Gumbel extreme-value return levels; q273: Markov removal-effect
# attribution; q274: Zipf's-law frequency-rank fit; q275: Newman
# modularity of the LPA partition; q276: position-based (U-shaped)
# attribution; q277: lexical-complexity profile; q278: multi-source
# BFS reach histogram; q279: Mantel-Haenszel stratified odds ratio;
# q280: cold-start coverage audit; q281: VaR/CVaR of revenue changes;
# q282: HITS hubs & authorities; q283: split-conformal forecast
# intervals; q284: held-out unigram cross-entropy; q285: out-of-fold
# target encoding; q286: isotonic calibration via the exact minimax
# identity; q287: three-detector anomaly consensus; q288: Welch
# weekend-effect test; q289: v-optimal segmentation by relational DP;
# q290: exactly-balanced stratified k-fold; q291: Markov entropy rate;
# q292: max drawdown; q293: NB overdispersion fit; q294: one-pass
# Poisson bootstrap SE; q295: multiple OLS by exact normal equations;
# q296: PCA top component by integer power iteration; q297: exact
# decision-stump split search; q298: Naive Bayes train + holdout eval;
# q299: logistic regression by integer IRLS; q300: off-policy IPS/
# SNIPS evaluation; q301: reciprocal-rank-fusion hybrid retrieval; and
# q302: distribution-free median CI; q303: boosted regression stumps;
# q304: additive seasonal decomposition; and q305: cross-source
# quantile normalization; q306: spectral token embedding from PPMI;
# q307: t-closeness privacy audit; and q308: newsvendor critical
# fractile; q309: Poisson mixture EM; q310: control-series causal
# impact; q311: mSPRT always-valid monitor; q312: exact Shapley
# attribution; q313: integer forecast-ensemble backtest; and q314:
# leave-one-group-out data valuation; q315: Bellman-Ford weighted
# SSSP; q316: extractive summarization; q317: grid DBSCAN; q318:
# segment uplift + Qini; q319: XmR control chart; and q320: retention
# decay fit; q321: cost-sensitive threshold; q322: Mahalanobis
# multivariate anomaly; q323: cross-validated stump selection; q324:
# elasticity what-if simulation; q325: Erlang-C staffing curve; and
# q326: watermark impact audit; q327: experiment health / SRM gate;
# q328: join-view incremental maintenance; and q329: partition-key
# advisor; q330: near-dup threshold advisor; and q331: embedding
# class-separation audit; q332: Neyman allocation; q333: systematic
# PPS sampling; q334: consistent-hash rebalance audit; q335: Dunning
# keyness per source; and q336: absorbing-chain expected lifetime;
# q337: TPC-H Q17 small-quantity revenue; q338: UCB1 bandit
# allocation; q339: KMV distinct sketch; q340: ordered event-pair
# support; q341: hard-negative mining; q342: paired weekend t-test;
# q343: schema-drift column matcher; q344: balanced class
# downsampling; q345: label-noise candidate export; q346: segmented
# SRM drill-down; q347: rolling windowed OLS trend; q348:
# column-encoding advisor; q349: TTL compliance sweep; q350: revenue
# price/volume bridge; q351: product-quantization audit; q352:
# top-k with OTHERS rollup; q353: candidate-key uniqueness audit;
# q354: ingest coverage-gap detection; q355: SLO burn-rate alerting;
# q356: join-order advisor; q357: subject-access extract; q358:
# growth accounting; q359: coherent cross-table sampling; q360:
# percent-of-parent shares; q361: linear-interpolation gap fill;
# q362: embedding isotropy audit; q363: Wilson score intervals;
# q364: leaderboard rank stability; q365: k-anonymity generalization
# advisor; q366: spend-quintile migration; q367: attribution window
# sensitivity; q368: session gap-parameter sweep; q369:
# calendar-mix-adjusted growth; q370: mutual-kNN hubness audit;
# q371: incremental dedup; q372: SCD-2 integrity audit; q373:
# metric-delta contribution; q374: lapse-signature contrast; q375:
# top-k WITH TIES; q376: landing/bounce session report; q377: LSH
# collision-precision profile; q378: envelope parse-health audit;
# q379: relational division; q380: Merkle-bucket reconciliation;
# q381: dataset card; q382: vocabulary drift; q383: salted two-phase
# aggregation; q384: row-size profile; q385: keyset pagination;
# q386: Boruvka spanning-forest round; q387: percolation sweep;
# q388: null-safe equi-join; q389: UNPIVOT reshape; q390: correlated
# LATERAL top-k; q391: calendar-semantics certification; q392: bag
# EXCEPT/INTERSECT ALL; q393: null-ordering certification; q394:
# id-continuity audit; q395: timezone-local rollup; and q396:
# rollup-chain validity audit; q397: cross-split content-leakage
# gate; q398: embedding-level leakage gate; and q399: two-way
# factorial ANOVA) hold pytest-oracle
# evidence at
# sf0.01 and sit past the window — they are ROUND 6's tier-1 rotation
# priority, exactly as q100-q124 were this round's.


def _ordered_specs():
    specs = all_queries()
    missing = [n for n in _WINDOW_PRIORITY if n not in specs]
    if missing:
        raise KeyError(f"window priority names not in registry: {missing}")
    rest = [n for n in specs if n not in set(_WINDOW_PRIORITY)]
    return {n: specs[n] for n in (*_WINDOW_PRIORITY, *rest)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query; non-SQL-expressible
    ops (streaming state, LSH candidate generation) are omitted on purpose —
    the driver records the weaker rows-only check for those."""
    return {
        name: spec.oracle for name, spec in _ordered_specs().items() if spec.oracle is not None
    }
