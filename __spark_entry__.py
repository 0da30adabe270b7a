"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``arrow_datafusion_spark/``; this module only
aggregates the per-family registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q1) on /root/testdata/sf0.001."""
    from arrow_datafusion_spark.queries import tpch

    return tpch.q1(spark, "/root/testdata/sf0.001")


def _registries() -> tuple[dict, dict]:
    from arrow_datafusion_spark.queries import (
        aggregates,
        clickbench,
        clickbench_verbatim,
        eventsuite,
        functions_suite,
        h2o,
        llm,
        pipeline,
        recursion,
        relational,
        sources,
        sqlsuite,
        substrait_suite,
        tpch,
        udfs,
        windows,
    )

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in (
        windows,
        aggregates,
        relational,
        sources,
        udfs,
        llm,
        pipeline,
        eventsuite,
        recursion,
        substrait_suite,
        h2o,
        functions_suite,
        sqlsuite,
        tpch,
        clickbench,
        clickbench_verbatim,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLE)

    # Registration order = the driver's check order, and the driver validates
    # a bounded window per round (50 entries in rounds 2-3). Entries WITHOUT
    # a green driver row run first:
    #   (a) never driver-checked in any round (r02/r03 key-set diff),
    #   (b) red in r02, since fixed, awaiting re-validation (fn_*),
    #   (c) red in r03 from oracle dtype casts, fixed this round,
    #   (d) agg_approx, rebuilt as driver-hashable bound checks,
    #   (e) TPC-H entries whose implementations changed AFTER their r02 green
    #       rows (scaled-int money sums, q21 semi-join rewrite) — stale greens.
    # Everything else (driver-green and unchanged since) follows.
    priority = [
        # (r) round-14 OPTIMIZATION changes, validate first (results must
        #     be IDENTICAL — every change was strict-oracle-verified
        #     locally before landing):
        #     ann_ivf: single corpus-scorer evaluation (asNondeterministic)
        #     + probe-side broadcast + memoized scorer UDF + expr-string
        #     struct trees; dedup_components: first propagation half-round
        #     folded into the init checkpoint job (labels byte-identical,
        #     one fewer round); dedup_minhash/dedup_ngram: signature-kernel
        #     digest memos moved to a worker-global module (values
        #     unchanged; verify UDF unchanged after the r14 A/B reversals);
        #     ann_lsh/dedup_embedding: NaN-high bucket-bit form (identical
        #     on finite inputs)
        "ann_ivf", "dedup_components", "dedup_minhash", "dedup_ngram",
        "ann_lsh", "dedup_embedding", "ann_cosine", "dedup_simhash",
        #     TPC-H builders rewritten to single-string expressions (V5
        #     py4j-build-time reduction) — physical plans asserted
        #     IDENTICAL to the r13 builders (normalized executedPlan
        #     equality, plans/r14) but every implementation line changed,
        #     so all 22 re-validate against the oracle first
        "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
        "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11",
        "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16",
        "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21",
        "tpch_q22",
        #     text_tfidf: eager corpus-count job folded into the DAG as a
        #     broadcast 1-row aggregate (scores byte-identical)
        "text_tfidf",
        #     rewrite-memo schema-fingerprint revalidation + comment-aware
        #     invalidation (context.py) — every ctx.sql-routed family;
        #     _CTX_CACHE single-entry eviction (cb_v_*)
        "sql_decimal_div", "sql_basic", "sql_settings", "sql_ddl_insert",
        "sql_params", "sql_info_schema", "fn_math", "fn_datetime",
        "h2o_mean_median", "h2o_sum_2key", "cb_v_count", "cb_v_avg_userid",
        "cb_v_phrase_topk", "cb_v_minute_series", "cb_v_user_phrase_limit",
        "cb_v_src_dst_offset",
        # (q) round-13 OPTIMIZATION changes, validate first (results must
        #     be IDENTICAL — every change was strict-oracle-verified
        #     locally before landing):
        #     Arrow kernel swaps: ngram anchor kernel + gram-count prune;
        #     fused LSH bucket+norm kernel; simhash entry on the Arrow
        #     kernel (all byte-identity-pinned in tests/test_plans.py)
        "dedup_ngram", "dedup_embedding", "dedup_simhash", "ann_lsh",
        "ann_cosine", "ann_ivf", "dedup_minhash",
        #     hits fixture re-encoded to a multi-part layout for the scan
        #     side (oracle unchanged) + per-session ctx caching — the
        #     derived/bound gates and the tie-audited LIMIT cuts are the
        #     sensitive rows; the rest of cb_v_* follows in (p)/(o)
        "cb_v_user_phrase_limit", "cb_v_src_dst_offset", "cb_v_avg_userid",
        "cb_v_phrase_topk", "cb_v_user_topk", "cb_v_url_topk",
        "cb_v_star_by_time", "cb_v_sums_90", "cb_v_minute_series",
        "cb_v_count", "cb_v_x_distinct_search", "cb_v_x_distinct_colors",
        "cb_v_x_country_distincts",
        #     SQL-rewrite memo (context.py _spark_sql) — every
        #     ctx.sql-routed family shares the layer; re-validate the
        #     representatives with settings/DDL interleavings
        "sql_basic", "sql_macros", "sql_settings", "sql_params",
        "sql_copy_to", "sql_ddl_insert", "sql_info_schema",
        "sql_decimal_div", "fn_datetime", "fn_math", "fn_array",
        "sql_case_in_between", "sql_cte_subquery", "sql_tilde_regex",
        "h2o_mean_median", "h2o_sum_2key", "agg_approx", "agg_tdigest",
        "sql_recursive_series", "recursive_reach",
        # (p) round-12 changes, validate first:
        #     the 2 formerly rows-only ClickBench statements now hash a
        #     derived deterministic gate (count + membership + the q39
        #     sort-key window sum) — VERDICT r11 #2
        "cb_v_user_phrase_limit", "cb_v_src_dst_offset",
        #     NEW: LEFT-OUTER stream-stream join drained against the batch
        #     LEFT JOIN oracle, NULL-extensions included (VERDICT r11 #6),
        #     and the FULL-OUTER form — both sides' watermark-proven
        #     NULL-extensions vs the batch FULL JOIN oracle
        "stream_join_outer", "stream_join_outer_full",
        #     NEW: directory-parquet LocalFiles round-trip (VERDICT r11
        #     #4); the consumer's LocalFiles read + scalar-subquery
        #     one-row shaping (ADVICE r11) touch every substrait entry
        "substrait_dir_scan", "substrait_exists_scalar",
        "substrait_producer_roundtrip", "substrait_setops",
        "substrait_tpch_q1", "substrait_named_join",
        #     ctx.sql rewrite layer touched (timestamp-literal ns
        #     reinterpret shapes, named-tz arrow_cast + date_trunc, TIME
        #     ns literals, arrow_typeof static literal typing, HLL p=14
        #     rsd fix, register_table pre-validation) — re-validate every
        #     ctx.sql-routed family sharing the layer
        #     NEW: the reference's extended.sql ClickBench statements
        #     (3 exact COUNT-DISTINCT shapes) join the verbatim registry
        "cb_v_x_distinct_search", "cb_v_x_distinct_colors",
        "cb_v_x_country_distincts",
        #     NEW: arrow's truncating decimal division driver-gated
        #     against an exact integer-math oracle
        #     (_rewrite_decimal_division — closes decimal.slt:397)
        "sql_decimal_div",
        "agg_approx", "agg_tdigest", "fn_datetime", "fn_math", "fn_array",
        "sql_basic", "sql_macros", "sql_case_in_between", "h2o_mean_median",
        "sql_cte_subquery", "write_parquet_roundtrip",
        # (o) round-11 changes, validate first:
        #     NEW: the REMAINING ClickBench verbatim statements join the
        #     registry (VERDICT r10 #7) — integer-exact SUM/AVG and
        #     tie-free-cut statements hash-gated, AVG(UserID) bound-gated,
        #     the under-determined trio rows-only (no oracle)
        "cb_v_sum_avg", "cb_v_avg_userid", "cb_v_region_users",
        "cb_v_region_mix", "cb_v_phone_model_users", "cb_v_phone_users",
        "cb_v_engine_phrase_count", "cb_v_user_topk",
        "cb_v_user_minute_phrase", "cb_v_google_url_phrase",
        "cb_v_google_title", "cb_v_star_by_time", "cb_v_phrase_by_time",
        "cb_v_phrase_by_time_phrase", "cb_v_counter_avg_len",
        "cb_v_referer_domains", "cb_v_sums_90", "cb_v_engine_ip_mix",
        "cb_v_watch_ip_mix", "cb_v_watch_ip_mix_all", "cb_v_url_topk_lit",
        "cb_v_clientip_tuple", "cb_v_user_phrase_topk",
        "cb_v_urlhash_offset", "cb_v_user_phrase_limit",
        "cb_v_pageviews_offset", "cb_v_src_dst_offset",
        #     NEW: Substrait EXISTS/scalar-subquery expressions and
        #     INTERSECT/EXCEPT set rels (producer + consumer + wire —
        #     VERDICT r10 #3); the existing substrait entries share the
        #     touched modules
        "substrait_exists_scalar", "substrait_setops",
        "substrait_producer_roundtrip", "substrait_tpch_q1",
        "substrait_named_join",
        #     t-digest SQL surface byte-guarded (approx.exact_max_bytes —
        #     VERDICT r10 #1) + windowed fallbacks now input-typed and
        #     with_weight weights cast integral; the approx family and
        #     every ctx.sql-rewrite-routed entry share the layer
        #     (_from_schema_map CTE column-list fix, f32 nested-call
        #     rescan, ::timestamp::bigint ns-reinterpret, arrow_cast
        #     int→Timestamp unit reinterpret)
        "agg_tdigest", "agg_approx", "sql_basic", "fn_math", "fn_datetime",
        "sql_macros", "fn_array", "h2o_mean_median", "sql_case_in_between",
        #     stream_dedup_watermark's gate watermark widened past the
        #     fixture spread (batching-independent equivalence)
        "stream_dedup_watermark",
        #     minhash candidate stage grew the gram-count Jaccard
        #     upper-bound prune (verified pair set byte-identical —
        #     tests/test_plans.py) and the signature kernels now emit
        #     struct<bands, ng>; approx_distinct runs at the reference's
        #     2^14-register precision on both surfaces
        "dedup_minhash", "dedup_ngram",
        #     q4's orders build side is now byte-gated broadcast (SF10 A/B
        #     2.2x); re-validate the touched TPC-H entry
        "tpch_q4",
        # (n) round-10 changes, validate first:
        #     NEW: the reference's ClickBench statements AS-WRITTEN over the
        #     100k-row full-schema hits fixture, driver-gated (VERDICT r9
        #     #6) — positional renames for the name-matched compare, oracle
        #     reads the same parquet via read_parquet
        "cb_v_count", "cb_v_count_filtered", "cb_v_distinct_users",
        "cb_v_distinct_phrases", "cb_v_minmax_date", "cb_v_adv_engine",
        "cb_v_phrase_topk", "cb_v_phrase_users_topk", "cb_v_point_lookup",
        "cb_v_like_count", "cb_v_phrase_order", "cb_v_url_topk",
        "cb_v_pageviews_url", "cb_v_pageviews_title", "cb_v_window_dims",
        "cb_v_minute_series",
        #     ctx.sql rewrite layer generalized alias-aware past single-FROM
        #     (_from_schema_map: median/decimal-avg/int-div/deep-array now
        #     fire on join shapes; decimal-avg OVER/FILTER regression fixed);
        #     interval plural-quirk + unary-minus-xor precedence rewrites;
        #     LATE r10: + _rewrite_f32_math (f32 round/sqrt kernels) and
        #     _rewrite_approx_percentile (faithful t-digest via
        #     collect_list + scalar pandas UDF) join the same pipeline —
        #     re-validate every ctx.sql-routed family sharing the layer;
        #     NEW agg_tdigest gates the t-digest surface (bound checks +
        #     the weight-1 digest-equality invariant); NEW
        #     stream_dedup_watermark gates dropDuplicatesWithinWatermark
        #     against the batch DISTINCT oracle; dedup_minhash's md5
        #     cold path was rewritten byte-identically (digest-bytes
        #     read + clear-on-full gram cache — 1000× probe fix) —
        #     re-validate it
        "agg_tdigest", "stream_dedup_watermark", "dedup_minhash",
        "sql_basic", "fn_math", "fn_array", "sql_macros", "h2o_mean_median",
        "fn_datetime", "sql_case_in_between", "sql_cte_subquery",
        #     literal-VALUES INSERT now writes one coalesced file (insertion
        #     order observable downstream) — re-validate the DDL entry
        "sql_ddl_insert",
        #     settings registry carries the reference's option doc text
        #     (SHOW VERBOSE); information_schema binding shares it
        "sql_settings", "sql_info_schema",
        #     Substrait producer emits InPredicate subqueries + UNION
        #     DISTINCT; consumer reads DISTINCT min/max/avg/any_value and
        #     union-distinct; producer reads pre-resolved AggregateExpression
        #     (any_value) — re-validate the substrait entries
        "substrait_producer_roundtrip", "substrait_tpch_q1",
        "substrait_named_join",
        # (m) round-9 changes, validate first:
        #     NEW: Substrait PRODUCER + binary wire — the entry produces a
        #     plan from the engine's logical-plan interchange tree, encodes
        #     it to protobuf wire bytes, decodes, consumes, executes
        #     (plans/substrait_producer.py, plans/substrait_wire.py)
        "substrait_producer_roundtrip",
        #     q15's single-partition collapse is now byte-gated with a
        #     cached partial-max fallback (coalesce path plan-unchanged at
        #     sf0.01, but re-validate the touched entry)
        "tpch_q15",
        #     CREATE EXTERNAL TABLE no longer eagerly mkdirs empty
        #     locations — re-validate the DDL-routed entry
        "sql_ddl_insert",
        #     dedup_components' blocking key widened to the 64-bit simhash
        #     string (16-bit space saturates at corpus scale — 100× probe);
        #     oracle SQL recomputes the same 64-bit key
        "dedup_components",
        #     ctx.sql rewrite layer grew xor-before-shift precedence,
        #     truncating decimal AVG, and static-depth flatten/
        #     array_to_string — re-validate the ctx.sql-routed families
        #     that share the layer (all re-checked hash-exact locally)
        "sql_basic", "fn_math", "fn_array", "sql_macros", "h2o_mean_median",
        #     Avro gained a public write sink and the reader now decodes
        #     each block with its own file's header (per-file schemas) —
        #     re-validate the scan entries riding that reader
        "scan_avro", "scan_avro_nested", "sql_copy_to",
        # (l) round-8 changes, validate first:
        #     q3 gained a SHUFFLE_HASH build on the semi-filtered orders
        #     side; q15 rebuilt (e4-long accumulator + coalesce(1) before
        #     the global-max window); q5/q10's filtered-fact broadcasts are
        #     now byte-gated (plan-only under the gate at sf0.01, but
        #     re-validate) — all hash-verified vs the sf0.01 oracle before
        #     landing (tools/driver_check.py)
        "tpch_q3", "tpch_q15", "tpch_q5", "tpch_q10",
        #     NEW in round 8: Substrait consumer (plans/substrait.py) —
        #     substrait_tpch_q1 executes the reference's third-party Isthmus
        #     artifact; substrait_named_join exercises the NamedTable path
        "substrait_tpch_q1", "substrait_named_join",
        #     digest() gained blake3 (pure-Python spec impl) on both SQL
        #     and DataFrame surfaces; fn_crypto's plan is otherwise
        #     untouched but shares the digest routing
        "fn_crypto",
        #     ctx.sql front-end: date_bin zero/negative month strides,
        #     window-frame guard scoping, DROP TABLE defaults cleanup —
        #     re-validate the ctx.sql-routed entries + datetime family
        "sql_macros", "fn_datetime", "sql_ddl_insert", "sql_basic",
        # (k) round-7 slt-divergence audit: corr gained the reference's
        #     population-stats zero-variance -> 0.0 semantics on BOTH
        #     surfaces (registry _corr, ctx.sql CASE rewrite) and array_agg
        #     is now NULL-preserving (struct-collect unwrap) — re-validate
        #     the entries whose plans changed (values verified hash-equal
        #     vs the sf0.01 oracle before landing)
        "agg_stats", "h2o_corr_r2", "agg_ordered",
        #     ctx.sql surface grew reference-exact regexp_replace routing,
        #     date_bin (2-arg / string-stride / month bins), epoch extract,
        #     TIMESTAMPTZ literals, and median type preservation — the
        #     ctx.sql-routed entries below were oracle-verified hash-equal
        #     at sf0.01 before landing; re-queue for the driver's own pass
        "sql_macros", "pipeline_redact", "sql_tilde_regex", "h2o_mean_median",
        # (j) round-7 changes, validate first:
        #     q3 rebuilt (un-hinted left-semi on projected BUILDING customer
        #     keys; compute-over-floor 0.065s -> ~0) and q10 rebuilt
        #     (per-customer revenue aggregated BELOW the customer join;
        #     0.052s -> ~0) — r7 A/B in tools/ab_tpch.py, hashes verified
        #     unchanged vs oracle at sf0.01 before landing
        "tpch_q3", "tpch_q10",
        #     q12 (SHUFFLE_HASH build side) and q13 (per-custkey pre-agg
        #     below the customer join) rebuilt from the SF1 bench lens —
        #     same A/B + hash-verify discipline
        "tpch_q12", "tpch_q13",
        #     context.py sql() front-end changed twice this round (string-
        #     literal-shielded case-insensitive qualifier stripping; the
        #     INT::DATE chain lowering for verbatim ClickBench) — re-validate
        #     the ctx.sql()-routed entries
        "sql_basic", "sql_cte_subquery", "sql_macros", "sql_tilde_regex",
        "sql_info_schema", "sql_settings", "sql_params", "sql_copy_to",
        # (i) round-6 changes: byte-gated broadcast + checkpoint-first
        #     candidate-doc set in the verify stage (dedup.py) touches both
        #     jaccard dedups; COPY TO gained single-file/headerless-csv/
        #     append semantics (sql_copy_to); array_has now returns NULL
        #     for NULL arrays on the DataFrame registry path (fn_array);
        #     information_schema rebuilt to the reference's ANSI layouts
        #     (settings registry, 'datafusion'/'public' naming) —
        #     sql_info_schema's binding changed underneath it
        "dedup_minhash", "dedup_ngram", "sql_copy_to", "fn_array",
        "sql_info_schema",
        #     _sql_recursive gained the reference's multiple-recursive-
        #     reference rejection (plan-time guard) — re-validate the
        #     recursion family
        "recursive_reach", "sql_recursive_series", "sql_recursive_graph",
        #     new entry: SET/df_settings round-trip (settings registry);
        #     dedup_components' convergence probe now rides the checkpoint
        #     job (Observation) — 1.94s -> 1.35s, labels unchanged
        "sql_settings", "dedup_components",
        #     q5 rebuilt: broadcast the filtered c⋈o build side instead of
        #     letting static stats broadcast lineitem (0.53s -> 0.40s)
        "tpch_q5",
        # (h) round-5 changes
        "scan_avro_nested",
        # (a) never checked
        "dedup_components", "text_tfidf", "pipeline_redact",
        "pipeline_decontaminate", "events_tumbling", "events_sliding",
        "events_session", "events_asof", "stream_windowed_counts",
        "stream_join_clicks_views", "range_join_bucketed", "hypertable_rollup",
        "recursive_reach", "sql_recursive_series", "sql_recursive_graph",
        "h2o_sum_2key", "h2o_mean_median", "h2o_range", "h2o_top2",
        "h2o_corr_r2", "h2o_distinct", "h2o_join_small", "h2o_join_medium",
        "h2o_join_left", "h2o_join_factor", "h2o_join_big", "fn_map",
        "sql_params", "sql_copy_to", "sql_values_join", "sql_case_in_between",
        # (b) fixed after r02 reds
        "fn_regex", "fn_datetime",
        # (c) fixed oracle casts (r03 reds)
        "agg_bits_bools", "scan_arrow",
        # (d) rebuilt with bound-check columns
        "agg_approx",
        # (e) stale r02 greens — implementation changed after validation
        "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q9", "tpch_q10",
        "tpch_q19", "tpch_q21", "tpch_q22",
        # (f) r03 greens whose implementation changed in round 4 (Arrow
        #     kernels / bucket-group candidates) — need re-validation
        "ann_ivf",
        # (g) new in round 4
        "sql_info_schema",
    ]
    # cb_v_* entries exist only when the reference checkout is present
    # (clickbench_verbatim degrades gracefully to an empty registry) —
    # drop them from the priority list rather than failing the whole
    # registry on a host without /root/reference
    priority = [
        n for n in priority if n in queries or not n.startswith("cb_v_")
    ]
    missing = [n for n in priority if n not in queries]
    assert not missing, f"priority list names unknown entries: {missing}"
    ordered = {n: queries[n] for n in priority}
    ordered.update({n: q for n, q in queries.items() if n not in ordered})
    ordered_oracles = {n: oracles[n] for n in ordered if n in oracles}
    return ordered, ordered_oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    return _registries()[1]
