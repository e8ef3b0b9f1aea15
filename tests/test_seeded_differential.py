"""Seeded-random differential fixtures (r15): beyond the single planted
cases, generate small adversarial events tables — guaranteed exact
(user_id, ts) collisions at second resolution and values on the
.5-cent-tie grid — and run the most tie-break-sensitive events-only
keys through the driver contract (registered query vs the key's own
DuckDB oracle, test_udf_edges._compare). Deterministic seeds: any
divergence is a reproducible ordering/rounding bug, not a flake."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from test_udf_edges import _compare

KEYS = (
    "join_asof_nearest",      # nearest-tie: backward-wins + equidistant
    "cdc_scd2_intervals",     # interval chaining under ts collisions
    "win_match_recognize",    # per-user sequence order under ties
    "win_islands_consecutive",  # gap/island edges under duplicate ts
    "win_sessionize",         # session splits exactly at the gap bound
    "rule_b3_overdraft_freeze",  # ledger sign + 24h freeze windows
    "cdc_latest_state",       # max_by under exact (ts, event_id) ties
    "win_ewma",               # integer-exact EWMA on a fresh series
    "win_drawdown",           # running-peak drawdown under ties
    "agg_retention_cohort",   # cohort-day bucketing across day edges
    "agg_maxby_latest",       # max_by ties on duplicate (user, ts)
    "agg_mode_exact",         # mode tie-break on the .5-cent value grid
    "agg_gini",               # exact-cents Lorenz sums, fresh spend curve
    "agg_time_rollup",        # hour/day bucket edges on collided ts
    "agg_benford_digits",     # leading-digit histogram, single-scan
    # r16 additions — the rest of the events-only r12 cohort through the
    # same adversarial net in the round it re-grades:
    "join_asof_interval",     # ignore-nulls last_value under (ts,id) ties
    "rule_b1_city_hop",       # lag(city) across exact ts collisions
    "rule_b2_session_overlap",  # overlap edge EXACTLY at collided ts
    "cdc_merge_upsert",       # max_by ties + op routing on the .5 grid
    "cdc_incremental_agg",    # Z-set retract/insert under the same ties
    "cdc_envelope_roundtrip",  # to_json/from_json identity on seeded props
    "win_rfm_score",          # R/F/M quintile ties on the value grid
    "rule_b4_first_forex",    # min-ts first-occurrence under ts collisions
    "rule_b7_regular_forex",  # distinct-day regularity across day edges
    "rule_b9_large_investor",  # top-10 election with value-grid ties
    "agg_pivot",              # pivoted exact-cents sums on the .5 grid
    "join_range_banded",      # banded interval join, points ON band edges
    # r17 additions — the five keys the r15/r16 seeds drained to zero
    # rows, revived by the denser skewed-user fixture (VERDICT r16 #2):
    "rule_b5_limit_3days",    # 3-consecutive-day runs need daily density
    "rule_b6_enquiry_intent",  # >10 views needs heavy users
    "rule_b8_regular_investor",  # >=4 click days AND >$100 sum
    "agg_having",             # >65 events splits heavy vs light users
    "rule_b10_cross_sell",    # anti leg LIVE: boosted values cross 150
    # r17 additions — the events-family r13 cohort through the net in
    # the round it re-grades (the r16 precedent; the sweep's probe run
    # caught win_lag_lead / win_running_frame one-cent ROUND flips here):
    "agg_approx_distinct",    # HLL++ vs exact distinct contract
    "agg_distinct",           # countDistinct under the skewed users
    "cdc_gdpr_erasure",       # erasure targeting under collided ts
    "fn_bitwise",             # bit flags from the fresh event mix
    "fn_json",                # props parse on permuted event_ids
    "fn_map_struct",          # map/struct build on fresh values
    "set_distinct_ops",       # INTERSECT/EXCEPT cohorts, value>90 gates
    "set_union_all",          # unionByName counts on the value grid
    "udf_scalar_python",      # Arrow scalar lane on .5-cent values
    "udf_vectorized_agg",     # pandas UDAF on collided (user, ts)
    "udf_cogrouped",          # full-outer cogroup, Python cents ties
    "win_funnel_conversion",  # step ordering under exact ts collisions
    "win_lag_lead",           # exact-cents lag/lead (r17 sweep fix)
    "win_running_frame",      # exact-cents running sums (r17 sweep fix)
    # r17 pull-forward — the events-family r14 cohort probed green on
    # these fixtures ahead of its r18 re-grade (spare-slot discipline):
    "agg_rolling_distinct",   # sliding distinct under collided ts
    "agg_sketch_cms",         # CMS point queries on the skewed users
    "agg_sketch_hll",         # HLL register merge on fresh ids
    "fn_variant",             # variant parse on permuted props
    "scan_json_corrupt",      # permissive-mode corrupt-record buckets
    "scan_json_lines",        # landed JSONL round-trip
    "scan_partition_pruned",  # partition pruning on landed dirs
    "scan_schema_evolution",  # mergeSchema across landed generations
    "scan_text",              # whole-line text scan summary
    "scan_xml",               # from-scratch XML row parse
    "set_bag_ops",            # INTERSECT/EXCEPT ALL multiplicities
    "sink_compacted",         # small-file compaction audit
    "sink_partitioned",       # hive-partitioned sink audit
    "sink_sorted_lake",       # sorted-files layout audit
    "sink_zorder_lake",       # z-order interleave audit
    "scan_jdbc",              # Derby round-trip of the per-user ledger
    "join_skew_salted",       # salted hot-key join (customer dim added)
    # r17 pull-forward — events-family r15 cohort, probed green ahead
    # of its r19 re-grade. join_spatial_grid is excluded WITH RATIONALE:
    # its points derive from distinct user_ids, and 14 users scatter a
    # 37x41 plane too sparsely for any neighbor pair (0 rows on both
    # seeds — a 0-row compare certifies nothing); it keeps its planted
    # fixture coverage.
    "agg_bitmap_distinct",    # roaring-style bitmap distinct counts
    "agg_kanonymity",         # k-anonymity bucket census
    "agg_pareto_8020",        # top-decile share on the skewed users
    "agg_regression_ols",     # decimal(38) moment sums
    "dq_expectations",        # expectation pass/fail census
    "fn_try_ansi",            # try_* null-on-error arithmetic
    "join_asof_forward",      # forward as-of under collided ts
    "sink_compression_codecs",  # multi-codec landed round-trip
    "udf_map_in_arrow",       # mapInArrow batch lane
    "win_resample_interp",    # grid resample + linear interpolation
    # r17 closure batch — with these, EVERY registered non-streaming,
    # non-generator key is in the net (residue: 18 stream_* keys, each
    # running a real micro-batch drain — covered by test_streaming plus
    # the per-round driver grade; datagen_* / scan_python_datasource,
    # whose generated rows are fixture-independent so a seeded compare
    # adds nothing; and join_spatial_grid, rationale above):
    "cdc_dedupe_batch",       # redelivery collapse on collided ids
    "cdc_snapshot_diff",      # inserted/changed/unchanged census
    "filter_null_domain",     # enum-domain bucket census
    "join_scd2_pointintime",  # point-in-time interval join
    "reshape_unpivot",        # wide->long stack round-trip
    "sink_write_audit_publish",  # WAP audit gate on fresh rows
    "win_anomaly_zscore",     # rolling z-score outlier flags
    "win_asof_gap_fill",      # gap-fill with last-known values
    "win_range_interval",     # trailing-hour RANGE frame
    "win_transition_matrix",  # event-type Markov transitions
    "join_asof_backward",     # backward as-of with o_orderdate == ts ties
)


def _build_events(d: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    n = 1400
    base = 1_700_000_000
    # ten days (so consecutive-day islands can form) x a SMALL intra-day
    # offset pool (so exact (user_id, ts) collisions still occur — both
    # seeds carry 17-23 exact (user_id, ts) duplicates at this density)
    secs = (
        base
        + rng.integers(0, 10, n) * 86_400
        + rng.integers(0, 600, n)
    )
    event_id = rng.permutation(n) + 1
    # SKEWED user weights (quadratic decay): per-user event counts span
    # ~1..270 so the threshold keys actually split the population —
    # agg_having's >65 and b6's >10-view cuts land INSIDE the per-user
    # range on both seeds (the r15 uniform draw left every user below
    # both cuts and drained the keys to 0 rows, VERDICT r16 #2)
    w = np.array([(15 - i) ** 2 for i in range(1, 15)], dtype=float)
    users = rng.choice(np.arange(1, 15), n, p=w / w.sum())
    # multiples of 0.005: value*100 lands on exact .5 ties; every 37th
    # row is boosted x12 (still exact cents, 0.06 grid) so purchase
    # values cross rule_b10's 150 gate — its anti leg excludes 3 of the
    # 10 regulars on each seed instead of nobody
    vals = rng.integers(0, 4000, n) * 0.005
    vals[::37] = vals[::37] * 12
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(event_id, type=pa.int64()),
                "ts": pa.array(
                    (secs * 1_000_000).astype("int64"),
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array(users, type=pa.int64()),
                "event_type": pa.array(
                    rng.choice(
                        ["view", "click", "purchase", "signup", "error"], n
                    ),
                    type=pa.string(),
                ),
                "value": pa.array(vals, type=pa.float64()),
                "props": pa.array(
                    [json.dumps({"k": int(i)}) for i in event_id],
                    type=pa.string(),
                ),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    # companion orders table for the cogrouped-reconciliation key (r17):
    # custkeys span the event users 1..14 PLUS orphans 90..93 (od-only
    # cogroups) while some light users get no orders (ev-only cogroups),
    # so the full-outer reconciliation exercises all three legs; prices
    # on the .005 grid land value*100 on exact .5 ties — the Python-side
    # half-away-from-zero cents path vs the oracle's ROUND.
    # Drawn AFTER every events draw: the RNG stream above (and the
    # fixture properties asserted on it) is unchanged.
    n_ord = 60
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1, n_ord + 1), type=pa.int64()),
                "o_custkey": pa.array(
                    np.concatenate(
                        [rng.integers(1, 15, n_ord - 6),
                         90 + rng.integers(0, 4, 6)]
                    ),
                    type=pa.int64(),
                ),
                "o_totalprice": pa.array(
                    rng.integers(0, 40000, n_ord) * 0.005, type=pa.float64()
                ),
                # same (day x 600-offset) grid as the events ts draw, so
                # exact o_orderdate == ts ties occur — the <= boundary a
                # BACKWARD as-of join must include
                "o_orderdate": pa.array(
                    (
                        (
                            base
                            + rng.integers(-2, 10, n_ord) * 86_400
                            + rng.integers(0, 600, n_ord)
                        )
                        * 1_000_000
                    ).astype("int64"),
                    type=pa.timestamp("us"),
                ),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    # companion customer dim for the salted skew join (r17): custkeys
    # cover the event users 1..14 AND the planted hot key 0 (so the
    # skew leg joins rows here — TPC-H-style custkeys start at 1 and
    # would drop it), plus 16..17 with no events. Drawn after all prior
    # draws; streams above unchanged.
    cust_keys = list(range(0, 18))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(cust_keys, type=pa.int64()),
                "c_mktsegment": pa.array(
                    rng.choice(
                        ["BUILDING", "MACHINERY", "HOUSEHOLD"],
                        len(cust_keys),
                    ),
                    type=pa.string(),
                ),
                # nationkey for the stream-static enrichment join
                # (drawn after the segment draw; prior streams unchanged)
                "c_nationkey": pa.array(
                    rng.integers(0, 5, len(cust_keys)), type=pa.int32()
                ),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(5), type=pa.int32()),
                "n_name": pa.array(
                    [f"NATION{i}" for i in range(5)], type=pa.string()
                ),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )


# third seed added r17 (ADVICE r16 #3: more seeds keep the calibrated
# thresholds honest against any one seed's accidents); 777001 was
# property-checked like the first two (threshold splits live, b5/b8/b10
# legs non-empty, 17 exact (user_id, ts) collisions)
@pytest.fixture(scope="module", params=[20250815, 994871, 777001])
def seeded_dir(request, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp(f"seeded_sf_{request.param}"))
    _build_events(d, request.param)
    return d


@pytest.mark.parametrize("key", KEYS)
def test_seeded_events_match_oracle(spark, seeded_dir, key):
    rows = _compare(spark, key, seeded_dir)
    assert rows, f"{key} produced no rows on the seeded fixture"
    if key in ("agg_having", "rule_b6_enquiry_intent"):
        # the threshold must SPLIT the 14-user population, not wave
        # everyone through (the r15 seeds left it draining to zero;
        # a fixture where every user qualifies is the opposite vacuity)
        assert 0 < len(rows) < 14, (key, len(rows))
    if key == "rule_b10_cross_sell":
        # the anti leg must be LIVE: fewer qualifiers than regulars
        # (>=5 distinct view days), i.e. the 150-gate excluded someone
        import duckdb

        con = duckdb.connect()
        n_regulars = con.execute(
            "SELECT COUNT(*) FROM ("
            "  SELECT user_id FROM read_parquet(?)"
            "  WHERE event_type = 'view' GROUP BY user_id"
            "  HAVING COUNT(DISTINCT CAST(ts AS DATE)) >= 5)",
            [os.path.join(seeded_dir, "events.parquet")],
        ).fetchone()[0]
        assert 0 < len(rows) < n_regulars, (len(rows), n_regulars)


JOIN_KEYS = (
    "join_anti",            # non-empty anti set HERE (fixture-dead on sf)
    "join_semi",
    "join_left_right_full",  # unmatched accounting on BOTH sides
    "join_lateral",         # per-key top-2 under planted price ties
    "join_inner_equi",      # orphan orders excluded + exact-cents sums
)


def _build_join(d: str, seed: int) -> None:
    """customer/orders where the shipped fixture's blind spots are live:
    ~1/3 of customers have NO orders (the sf tables give every customer
    an order, so join_anti's sf0.01 result is structurally empty), some
    orders are ORPHANS (o_custkey outside customer — right/full
    unmatched legs), and o_totalprice draws from a .125 grid so the
    lateral top-2 hits exact price ties broken by o_orderkey."""
    rng = np.random.default_rng(seed)
    n_cust = 30
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(1, n_cust + 1), type=pa.int64()),
                "c_nationkey": pa.array(
                    rng.integers(0, 5, n_cust), type=pa.int64()
                ),
                "c_mktsegment": pa.array(
                    rng.choice(["BUILDING", "MACHINERY", "HOUSEHOLD"], n_cust),
                    type=pa.string(),
                ),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    n_ord = 120
    # order owners: customers 1..20 only (21..30 are anti-join rows),
    # plus orphan keys 900+ that match no customer
    owners = np.concatenate(
        [rng.integers(1, 21, n_ord - 8), 900 + rng.integers(0, 4, 8)]
    )
    # join_anti's r16 predicate is "no order with o_totalprice > 400000":
    # the first 12 (non-orphan) orders sit strictly above that threshold
    # on the same .125 grid, the rest stay ~1000 — so the anti set here
    # exercises BOTH legs: customers with no orders at all (21..30) AND
    # customers whose orders are all small.
    prices = rng.integers(8_000, 8_040, n_ord) * 0.125
    prices[:12] = rng.integers(3_200_001, 3_200_041, 12) * 0.125
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1, n_ord + 1), type=pa.int64()),
                "o_custkey": pa.array(owners, type=pa.int64()),
                "o_totalprice": pa.array(prices, type=pa.float64()),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )


@pytest.fixture(scope="module", params=[7, 4242])
def join_dir(request, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp(f"join_sf_{request.param}"))
    _build_join(d, request.param)
    return d


@pytest.mark.parametrize("key", JOIN_KEYS)
def test_seeded_joins_match_oracle(spark, join_dir, key):
    rows = _compare(spark, key, join_dir)
    assert rows, f"{key} produced no rows on the seeded join fixture"
    if key == "join_anti":
        # both anti legs LIVE: the 10 order-less customers (21..30) are
        # always anti; at most 12 of customers 1..20 hold a big order,
        # so at least 8 small-only customers join them — and at least
        # one customer DOES hold a big order, so the set is proper
        total = sum(r[1] for r in rows)
        assert 18 <= total < 30, total


DEDUP_KEYS = (
    "dedup_exact",
    "dedup_ngram_jaccard",   # PPJoin prefix filter on borderline pairs
    "dedup_near_minhash",    # 16-perm banding, bit-exact in both engines
    "dedup_simhash",         # 6x10-bit bands + Hamming-1 multi-probe
    "dedup_cluster_cc",      # label propagation over TRANSITIVE chains
    "dedup_keep_best",       # survivor election within chained clusters
    # r17 pull-forward (r14 cohort, probed green on the mutant corpus):
    "dedup_containment",     # asymmetric C(A,B) prefix filter
    "dedup_incremental",     # PPJoin probe side = new docs only
    # r17 pull-forward (r15 cohort):
    "dedup_paragraph",       # paragraph-frequency counting
    "dedup_semantic_cluster",  # SemDeDup recall contract
)


def _build_dedup(d: str, seed: int) -> None:
    """documents drawn from a 40-word vocabulary so random pairs carry
    NATURAL partial shingle overlap — including pairs near the 0.6
    Jaccard / hamming-9 decision boundaries the shipped corpus only
    approaches from the planted-twin side. Every dedup oracle mirrors
    its full pipeline (perturbation, perms, banding, multi-probe) in
    DuckDB, so the compare is bit-exact even for the probabilistic
    blockers."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(400)])
    # 15 base docs + for each a MUTANT with a substitution rate swept
    # 0..40%: the pair spectrum crosses the Jaccard-0.6 / hamming-9
    # decision boundaries from both sides (the shipped corpus only has
    # extreme twins). A boundary pair a probabilistic blocker misses is
    # missed identically in the mirrored oracle — bit-exact, no flakes.
    texts = []
    for i in range(15):
        words = rng.choice(vocab, rng.integers(24, 41))
        texts.append(" ".join(words))
        mut = words.copy()
        k = int(len(mut) * (0.4 * i / 14))
        if k:
            mut[rng.choice(len(mut), k, replace=False)] = rng.choice(
                vocab, k
            )
        texts.append(" ".join(mut))
        # TRANSITIVE chains for the CC keys: bases 2 and 4 get a
        # GRANDCHILD mutated ~10% further from the mutant — similar to
        # the mutant, usually not to the base, so the cluster only
        # forms through label propagation, not direct pairing
        if i in (2, 4):
            gc = mut.copy()
            k2 = max(1, len(gc) // 10)
            gc[rng.choice(len(gc), k2, replace=False)] = rng.choice(
                vocab, k2
            )
            texts.append(" ".join(gc))
    n_docs = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n_docs, type=pa.string()),
                "source": pa.array(
                    rng.choice(["web", "books", "code"], n_docs),
                    type=pa.string(),
                ),
                "n_chars": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    # companion embeddings for the multimodal join key (r17): vec_ids
    # overlap doc_ids 0..19 (doc_id % 4 == 0 rows stay matched), fresh
    # float32 vectors. Drawn AFTER every documents draw — the RNG stream
    # above is unchanged.
    n_vec, dim = 20, 8
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vec), type=pa.int64()),
                "embedding": pa.array(
                    [
                        np.asarray(rng.normal(size=dim), dtype=np.float32)
                        .tolist()
                        for _ in range(n_vec)
                    ],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(
                    (np.arange(n_vec) % 5).astype("int32"), type=pa.int32()
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


@pytest.fixture(scope="module", params=[31337, 271828])
def dedup_dir(request, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp(f"dedup_sf_{request.param}"))
    _build_dedup(d, request.param)
    return d


@pytest.mark.parametrize("key", DEDUP_KEYS)
def test_seeded_dedup_matches_oracle(spark, dedup_dir, key):
    # rows may legitimately be empty for a seed (near-dup content is
    # random); the value is the bit-exact compare across the boundary
    # pairs, not a fixed count
    _compare(spark, key, dedup_dir)


TEXT_KEYS = (
    # r17: the documents-family r13 cohort through the same adversarial
    # corpus in the round it re-grades (vocabulary docs + mutant chains;
    # plus the companion embeddings table for the multimodal join)
    "fn_hash",                 # md5/sha256 on the synthetic corpus
    "sample_stratified_split",  # hash-split balance on fresh docs
    "text_bpe_tokenize",       # merge-literal tokenizer on w-vocab text
    "text_chunk",              # chunk boundaries on 24-40-word docs
    "text_idf_rarity",         # IDF over the 400-word vocabulary
    "text_langid",             # n-gram profile scores on synthetic text
    "text_pack_sequences",     # greedy packing of fresh length mix
    "text_quality",            # length/punct/stopword ratios
    "text_redact_pii",         # regex sweep over non-PII corpus
    "text_stats",              # per-doc counts on fresh docs
    "token_count_bpe",         # regex token counts
    "udtf_expand",             # per-token UDTF expansion rows
    "multimodal_cols",         # docs JOIN embeddings metadata row
    "multimodal_decode",       # BMP encode/decode layout math
    "multimodal_framesample",  # frame-sample stride math
    # r17 pull-forward (r14 cohort, probed green on the mutant corpus):
    "fn_url",                  # URL parse family on doc-derived urls
    "sample_bootstrap_means",  # LCG bootstrap replicates
    "sample_split_leakage_safe",  # cluster-aware split, no leakage
    "sample_weighted_priority",  # deterministic weighted sampling
    "text_decontaminate",      # benchmark-shingle broadcast filter
    "text_ngram_freq",         # top-ngram election with tie-breaks
    # r17 pull-forward (r15 cohort):
    "fn_collation",            # collation-sensitive compare census
    "fn_crypto",               # aes round-trip + hmac lengths
    "fn_string",               # string family on the mutant corpus
    "join_fuzzy_edit_distance",  # levenshtein<=1 lexicon probes
    "sample_temperature_mix",  # temperature-weighted source mix
    "text_repetition_gopher",  # gopher repetition ratios
    "text_zipf_fit",           # zipf slope on the 400-word vocab
    "scan_binaryfile",         # real .bmp binaryFile ingest
    # r17 closure batch:
    "text_bpe_train",          # BPE merges from the word-freq table
    "text_fingerprint",        # mod-before-sum polynomial hash
)


@pytest.mark.parametrize("key", TEXT_KEYS)
def test_seeded_text_matches_oracle(spark, dedup_dir, key):
    rows = _compare(spark, key, dedup_dir)
    assert rows, f"{key} produced no rows on the seeded corpus"


# r17 closure: the streaming keys through the same net, slow-marked —
# each runs a real micro-batch drain (landing write + query start), so
# they ride the slow suite like test_value_discrimination's stream legs.
# stream_dedup_incremental is documents-family; the other 17 ride the
# events fixture (customer gained c_nationkey + a nation dim for the
# stream-static enrichment join).
STREAM_KEYS = (
    "stream_backfill_availablenow",
    "stream_bronze_ingest",
    "stream_dedupe",
    "stream_foreachbatch_merge",
    "stream_join_static",
    "stream_observe_metrics",
    "stream_python_datasource",
    "stream_rate_sim",
    "stream_scd2_apply",
    "stream_session",
    "stream_sliding",
    "stream_stateful_freeze",
    "stream_stream_join",
    "stream_transform_with_state",
    "stream_tumbling",
    "stream_tws_topk_state",
    "stream_watermark_late",
)


@pytest.mark.slow
@pytest.mark.parametrize("key", STREAM_KEYS)
def test_seeded_stream_matches_oracle(spark, seeded_dir, key):
    rows = _compare(spark, key, seeded_dir)
    assert rows, f"{key} produced no rows on the seeded fixture"


@pytest.mark.slow
def test_seeded_stream_dedup_incremental_matches_oracle(spark, dedup_dir):
    rows = _compare(spark, "stream_dedup_incremental", dedup_dir)
    assert rows, "stream_dedup_incremental produced no rows"


@pytest.fixture(scope="module")
def spatial_dir(tmp_path_factory) -> str:
    """Dense DETERMINISTIC events for join_spatial_grid (the one key the
    skewed 14-user fixture cannot feed — its points derive from distinct
    user_ids, and 14 points scatter the 37x41 plane with no neighbor
    pairs). 600 consecutive user_ids tile the plane densely: 7,965 pairs
    within radius and 718 EXACTLY at dist2 == 25 — the <= boundary the
    grid blocking must include."""
    d = str(tmp_path_factory.mktemp("spatial_sf"))
    n = 600
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, n + 1), type=pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_000_000] * n, type=pa.timestamp("us")
                ),
                "user_id": pa.array(range(1, n + 1), type=pa.int64()),
                "event_type": pa.array(["view"] * n, type=pa.string()),
                "value": pa.array([1.0] * n, type=pa.float64()),
                "props": pa.array(["{}"] * n, type=pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


def test_spatial_grid_dense_matches_oracle(spark, spatial_dir):
    rows = _compare(spark, "join_spatial_grid", spatial_dir)
    assert len(rows) == 7965, len(rows)
    # the exact-boundary pairs must be INCLUDED (<=, not <)
    assert sum(1 for r in rows if r[2] == 25) == 718


EMB_KEYS = (
    "dedup_embedding_cosine",  # 0.99 bp gate from both sides
    "sim_topk_cosine",         # exact ranking on a fresh distribution
    "embedding_quantize_int8",  # bound contract on adversarial vectors
    # r17: embeddings-family r13 cohort in the round it re-grades
    "fn_array",                # HOF sums/sorts on crafted vectors
    "sim_maxsim_ann",          # PLAID retrieve-rerank recall contract
    "sim_topk_lsh",            # hyperplane LSH + multi-probe recall
    # r17 pull-forward (r15 cohort):
    "sample_negative_pairs",   # LCG negative sampling
    "sim_maxsim_multivector",  # exact MaxSim over pseudo-multivectors
    "sim_topk_ivf",            # IVF-flat fixed-grid quantizer
    "sim_topk_ivf_kmeans",     # trained-quantizer recall contract
)


def _build_emb(d: str) -> None:
    """embeddings: 40 random float32 vectors (ids 0..39, labels id%5 —
    the query set 0..9 stays populated) plus four CRAFTED same-label
    pairs at cosine 0.9950 / 0.9905 / 0.9895 / 0.9850 — the 0.99 gate
    approached from both sides with a >=5e-4 margin (float32 storage
    shifts the realized cosine by ~1e-7, so neither engine can land on
    the bp rounding knife edge). Crafted ids are odd, dodging the
    operator's own %10 twin planting; crafted labels >= 10 so random
    vectors never join them."""
    rng = np.random.default_rng(90210)
    dim = 16
    ids, labels, vecs = [], [], []
    for i in range(40):
        ids.append(i)
        labels.append(i % 5)
        vecs.append(rng.normal(size=dim))
    for j, cos in enumerate([0.9950, 0.9905, 0.9895, 0.9850]):
        v1 = rng.normal(size=dim)
        v1 /= np.linalg.norm(v1)
        u = rng.normal(size=dim)
        u -= (u @ v1) * v1
        u /= np.linalg.norm(u)
        v2 = cos * v1 + np.sqrt(1 - cos * cos) * u
        ids += [201 + 4 * j, 203 + 4 * j]
        labels += [10 + j, 10 + j]
        vecs += [v1, v2]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(
                    [np.asarray(v, dtype=np.float32).tolist() for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(labels, type=pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("emb_sf"))
    _build_emb(d)
    return d


@pytest.mark.parametrize("key", EMB_KEYS)
def test_seeded_embeddings_match_oracle(spark, emb_dir, key):
    rows = _compare(spark, key, emb_dir)
    assert rows, f"{key} produced no rows on the seeded embeddings"
    if key == "dedup_embedding_cosine":
        crafted = {
            (a, b) for a, b, _ in [tuple(r) for r in rows] if a >= 200
        }
        # both above-gate pairs in, both below-gate pairs out
        assert crafted == {(201, 203), (205, 207)}, crafted


LAKE_KEYS = (
    "sql_pricing_summary",  # Q1 cutoff actually filters rows here
    "profile_columns",      # value-histogram profile on fresh grids
    "subquery_family",      # decorrelation + exact cross-multiply avg
    "sort_multi",           # multi-key sort with planted priority ties
    "limit_topk",           # top-k tie-breaks on the .125 price grid
    "topk_per_group",       # per-group rank ties
    "agg_percentile",       # exact percentiles landing ON tied values
    "graph_pagerank",       # 10 integer-exact iterations, fresh graph
    # r16 additions — remaining lineitem-shaped r12-cohort keys:
    "agg_global",           # global exact-cents aggregates on tied grids
    "agg_groupby",          # grouped sums under .5-cent discount ties
    "agg_stats_corr",       # decimal(38) moments vs HUGEINT on fresh data
    # r17 addition — shipdates now straddle BOTH predicate windows, so
    # filter_pred's 1996 BETWEEN window is live (VERDICT r16 #2);
    # (reshape_unpivot needs events, covered by the planted fixtures)
    "filter_pred",          # conjunctive BETWEEN/IN with live date window
    # r17: lake-family r13 cohort in the round it re-grades (the sweep's
    # probe run caught project_rename_cast's truncate-vs-round cast here)
    "project_rename_cast",  # exact 1e-4 net price + TRUNC-mirrored cast
    "win_distribution",     # cume_dist/percent_rank under price ties
    "win_ranking",          # ntile/rank on .125-grid acctbal ties
    "graph_triangle_count",  # support-5 projection graph, 10 suppliers
    # r17 pull-forward (r14 cohort; the probe here caught
    # agg_approx_percentile's value-band contract failing small groups)
    "agg_approx_percentile",  # rank-space sketch contract (r17 fix)
    "agg_histogram_bins",   # cents-exact bucket arithmetic
    "join_bucketed_colocated",  # co-bucketed exchange-free join
    "scan_avro",            # from-scratch avro round-trip
    "scan_csv",             # csv round-trip with header/types
    "scan_orc",             # orc round-trip
    "scan_parquet",         # parquet scan summary
    # r17 pull-forward (r15 cohort):
    "fn_conditional",       # case/coalesce/nullif ladder
    "fn_datetime",          # datetime family on straddled dates
    "fn_math_decimal",      # decimal math on the .125/.005 grids
    "sql_recursive_cte",    # iterative-union recursion
    # r17 closure batch (region/part companions added to the builder):
    "join_broadcast",       # dim-chain broadcast join
    "join_multiway",        # 5-table chain incl. orphan orders
    "join_cross_topk",      # bounded cross-relation top-k
    "join_theta_range",     # bands with p_size ON the 15/35 edges
    "agg_rollup_cube_gsets",  # rollup/cube/grouping-sets census
)


def _build_lake(d: str, seed: int) -> None:
    """Full-schema customer/orders/nation/lineitem with adversarial
    value grids: prices on .125 and discounts/taxes on .005 (exact
    .5-cent rounding ties), order priorities drawn from a 3-value pool
    so multi-key sorts tie on the leading key, and l_shipdate
    STRADDLING the 1998-09-01 pricing-summary cutoff (the shipped
    fixture exercises only one side of the predicate)."""
    rng = np.random.default_rng(seed)
    n_cust, n_ord, n_li = 30, 120, 400
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(1, n_cust + 1), type=pa.int64()),
                "c_name": pa.array(
                    [f"Customer{i}" for i in range(1, n_cust + 1)],
                    type=pa.string(),
                ),
                "c_nationkey": pa.array(
                    rng.integers(0, 5, n_cust), type=pa.int32()
                ),
                "c_acctbal": pa.array(
                    rng.integers(-8_000, 80_000, n_cust) * 0.125,
                    type=pa.float64(),
                ),
                "c_mktsegment": pa.array(
                    rng.choice(["BUILDING", "MACHINERY", "HOUSEHOLD"], n_cust),
                    type=pa.string(),
                ),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(5), type=pa.int32()),
                "n_name": pa.array(
                    [f"NATION{i}" for i in range(5)], type=pa.string()
                ),
                "n_regionkey": pa.array([0, 0, 1, 1, 1], type=pa.int32()),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )
    cutoff = 904_608_000  # 1998-09-01 00:00:00 UTC
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(1, n_ord + 1), type=pa.int64()),
                "o_custkey": pa.array(
                    np.concatenate(
                        [rng.integers(1, 21, n_ord - 8),
                         900 + rng.integers(0, 4, 8)]
                    ),
                    type=pa.int64(),
                ),
                "o_orderstatus": pa.array(
                    rng.choice(["O", "F", "P"], n_ord), type=pa.string()
                ),
                "o_totalprice": pa.array(
                    rng.integers(8_000, 8_040, n_ord) * 0.125,
                    type=pa.float64(),
                ),
                "o_orderdate": pa.array(
                    (cutoff + rng.integers(-100, 100, n_ord) * 86_400)
                    * 1_000_000,
                    type=pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    rng.choice(
                        ["1-URGENT", "2-HIGH", "3-MEDIUM"], n_ord
                    ),
                    type=pa.string(),
                ),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.integers(1, n_ord + 1, n_li), type=pa.int64()
                ),
                "l_partkey": pa.array(
                    rng.integers(1, 51, n_li), type=pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(1, 11, n_li), type=pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li), type=pa.int32()
                ),
                "l_quantity": pa.array(
                    rng.integers(4, 200, n_li) * 0.25, type=pa.float64()
                ),
                "l_extendedprice": pa.array(
                    rng.integers(8_000, 80_000, n_li) * 0.125,
                    type=pa.float64(),
                ),
                "l_discount": pa.array(
                    rng.integers(0, 21, n_li) * 0.005, type=pa.float64()
                ),
                "l_tax": pa.array(
                    rng.integers(0, 17, n_li) * 0.005, type=pa.float64()
                ),
                "l_returnflag": pa.array(
                    rng.choice(["A", "N", "R"], n_li), type=pa.string()
                ),
                "l_linestatus": pa.array(
                    rng.choice(["O", "F"], n_li), type=pa.string()
                ),
                # first half STRADDLES the 1998-09-01 pricing cutoff;
                # second half lands INSIDE filter_pred's 1996-01-01..
                # 1997-01-01 BETWEEN window (r17: the cutoff-only draw
                # left that window empty and filter_pred out of the net)
                "l_shipdate": pa.array(
                    np.concatenate(
                        [
                            cutoff
                            + rng.integers(-90, 90, n_li - n_li // 2)
                            * 86_400,
                            820_454_400  # 1996-01-01 00:00:00 UTC
                            + rng.integers(0, 366, n_li // 2) * 86_400,
                        ]
                    )
                    * 1_000_000,
                    type=pa.timestamp("us"),
                ),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    # region + part companions (r17, drawn after all prior draws): the
    # two regions nation points at, and parts whose p_size hits the
    # theta-band EDGES 15 and 35 exactly (the > lo AND <= hi boundary)
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], type=pa.int32()),
                "r_name": pa.array(["REGION0", "REGION1"], type=pa.string()),
            }
        ),
        os.path.join(d, "region.parquet"),
    )
    n_part = 40
    sizes = rng.integers(1, 51, n_part)
    sizes[:2] = [15, 35]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(1, n_part + 1), type=pa.int64()),
                "p_size": pa.array(sizes, type=pa.int32()),
                "p_retailprice": pa.array(
                    rng.integers(7_000, 15_000, n_part) * 0.125,
                    type=pa.float64(),
                ),
            }
        ),
        os.path.join(d, "part.parquet"),
    )


@pytest.fixture(scope="module", params=[60901, 13, 90125])
def lake_dir(request, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp(f"lake_sf_{request.param}"))
    _build_lake(d, request.param)
    return d


@pytest.mark.parametrize("key", LAKE_KEYS)
def test_seeded_lake_tables_match_oracle(spark, lake_dir, key):
    rows = _compare(spark, key, lake_dir)
    assert rows, f"{key} produced no rows on the seeded lake tables"
