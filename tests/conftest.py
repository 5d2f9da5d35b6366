from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from temporal_retriever_spark.session import get_spark

    session = get_spark("trs-tests")
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from temporal_retriever_spark.sources import load_tables

    return load_tables(spark, sf_dir)


def _fresh_duck(sf_dir: str):
    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            # Spark-written tables are directories of part files (the
            # .scale/sf1+ sweep datasets) — DuckDB needs the glob form
            con.execute(
                f"CREATE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


@pytest.fixture(scope="function")
def duck(sf_dir):
    # Function-scoped by design: a session-scoped connection shared across
    # a 32-thread Spark suite produced rare transient failures under load
    # (BASELINE.md flake notes, 2026-08-15). A fresh in-process connection
    # per test costs ~ms (views over parquet are lazy) and removes the
    # shared-state failure mode by construction.
    con = _fresh_duck(sf_dir)
    yield con
    con.close()


def _canon(df: pd.DataFrame, round_floats: int = 6) -> pd.DataFrame:
    """Canonical form mirroring the driver's compare: columns sorted by
    name, float columns rounded, rows sorted by all columns."""
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if pd.api.types.is_float_dtype(df[col]):
            df[col] = df[col].round(round_floats)
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = pd.to_datetime(df[col]).dt.tz_localize(None)
        if df[col].dtype == object:
            df[col] = df[col].map(
                lambda v: str(v) if not isinstance(v, (str, type(None))) else v
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, sql: str, round_floats: int = 6):
    """Compare a Spark DataFrame against a DuckDB oracle query."""
    got = _canon(spark_df.toPandas(), round_floats)
    try:
        oracle_pd = duck_con.execute(sql).df()
    except duckdb.Error:
        # Infra retry (not a correctness retry): rerun the oracle once on a
        # brand-new connection so a transient engine hiccup under suite load
        # cannot masquerade as a query failure. A genuinely bad oracle SQL
        # fails identically on the fresh connection and still surfaces.
        retry_con = _fresh_duck(SF_DIR)
        try:
            oracle_pd = retry_con.execute(sql).df()
        finally:
            retry_con.close()
    want = _canon(oracle_pd, round_floats)
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            # Exact equality on the canonicalized 6-dp values — mirrors
            # the driver's value-hash. A tolerance here hides the exact
            # grid flips the offset-guarded rounding is designed to
            # prevent (ADVICE r6: isclose(abs_tol=1e-6) accepted
            # adjacent grid values).
            ok = [
                (a == b) or (pd.isna(a) and pd.isna(b)) for a, b in zip(g, w)
            ]
            assert all(ok), f"value mismatch in {col}: {[(a, b) for (a, b), o in zip(zip(g, w), ok) if not o][:5]}"
        else:
            pd.testing.assert_series_equal(
                g.astype(str), w.astype(str), check_names=False, obj=col
            )


# Measured >5 s tail of the suite (box: local[4] per session, r10
# durations log): excluded from the default run via pytest.ini's
# `-m "not slow"` so the driver-window run finishes; the full suite
# remains the round-end evidence target (`-m "slow or not slow"`).
# Frozen nodeids rather than scattered decorators so the whole policy
# is auditable in one place.
SLOW_TESTS = {
    "tests/test_causal_text_extras.py::TestMarkovAbsorption::test_dead_end_transient_leaks_mass",
    "tests/test_causal_text_extras.py::TestMarkovAbsorption::test_matches_numpy_fundamental_matrix",
    "tests/test_changepoint.py::test_prior_scale_controls_flexibility",
    "tests/test_classify.py::TestPoisson::test_learns_rate_structure",
    "tests/test_dsir.py::test_low_temperature_is_argmax",
    "tests/test_dsir.py::test_salt_determinism",
    "tests/test_dup_clusters.py::test_star_clusters_bounded_rounds_on_deep_chain",
    "tests/test_dup_clusters.py::test_star_matches_label_on_random_graph",
    "tests/test_features.py::TestQuantileRegression::test_quantile_ordering_and_coverage",
    "tests/test_graph.py::TestConnectedComponents::test_label_method_agrees",
    "tests/test_graph.py::TestHits::test_unit_norms_and_ordering",
    "tests/test_graph.py::TestPageRank::test_authority_ordering",
    "tests/test_graph.py::TestPageRank::test_matches_reference_with_dangling",
    "tests/test_graph.py::TestPageRank::test_parallel_edges_and_self_loops_collapsed",
    "tests/test_inference.py::TestPropensityATT::test_caliper_drops_distant_matches",
    "tests/test_llm_dedup.py::TestAllPairsJaccard::test_exactly_matches_bruteforce",
    "tests/test_llm_dedup.py::test_embedding_probe_restriction_matches_full",
    "tests/test_llm_similarity.py::TestLof::test_probe_ids_path_matches_full_exact",
    "tests/test_llm_similarity.py::test_lsh_topk_recall",
    "tests/test_mixture.py::TestGmmEm::test_component_collapse_guard",
    "tests/test_mixture.py::TestGmmEm::test_higher_loglik_than_single_gaussian",
    "tests/test_mixture.py::TestGmmEm::test_recovers_bimodal_structure",
    "tests/test_mixture.py::TestGmmEm::test_three_components",
    "tests/test_pipeline.py::test_analyze_changepoint_knob",
    "tests/test_pipeline.py::test_size_gated_partitioning",
    "tests/test_plan_growth.py::TestIterativePlanGrowth::test_als_train",
    "tests/test_plan_growth.py::TestIterativePlanGrowth::test_connected_components_label",
    "tests/test_plan_growth.py::TestIterativePlanGrowth::test_connected_components_star",
    "tests/test_plan_growth.py::TestIterativePlanGrowth::test_hits",
    "tests/test_plan_growth.py::TestIterativePlanGrowth::test_pagerank",
    "tests/test_plan_shapes.py::test_streaming_bucket_aggregate_stateful_replay_parity",
    "tests/test_pq.py::TestIVFPQ::test_candidates_only_probed_cells",
    "tests/test_pq.py::TestIVFPQ::test_refined_recall",
    "tests/test_pq.py::test_precomputed_codes_reused",
    "tests/test_pq.py::test_reconstruction_error_improves_with_codes",
    "tests/test_properties.py::test_association_rule_invariants",
    "tests/test_prophet_map.py::test_auto_seasonality_rules",
    "tests/test_prophet_map.py::test_kkt_optimality",
    "tests/test_prophet_map.py::test_recovers_piecewise_trend_and_forecast_slope",
    "tests/test_prophet_map.py::test_regressor_coefficient_recovery",
    "tests/test_prophet_map.py::test_uncertainty_intervals_deterministic_and_calibrated",
    "tests/test_prophet_map.py::test_weekly_component_recovered",
    "tests/test_review_fixes.py::test_pq_refine_one_returns_exact_cosine",
    "tests/test_server.py::test_analyze_example_fixture_matches_pipeline",
    "tests/test_server.py::test_analyze_response_conforms_to_typed_models",
    "tests/test_server.py::test_saturating_growth_electricity_fixture",
    "tests/test_server.py::test_saturating_growth_single",
    "tests/test_similarity.py::TestDbscan::test_min_pts_one_makes_everything_core",
    "tests/test_similarity.py::TestDbscan::test_roles_and_clusters",
    "tests/test_streaming_join.py::test_left_outer_emits_unmatched",
    "tests/test_streaming_join.py::test_stream_join_matches_batch",
    "tests/test_streaming_join.py::test_streaming_funnel_matches_batch",
    "tests/test_streaming_lm.py::test_stream_equals_batch",
    "tests/test_streaming_sessions.py::test_streaming_anomaly_matches_batch",
    "tests/test_streaming_state.py::test_stateful_running_stats_match_batch",
    "tests/test_streaming_timeout.py::test_processing_time_timeout_expires_state",
    "tests/test_streaming_topk.py::test_exact_when_capacity_covers_vocabulary",
    "tests/test_streaming_topk.py::test_groups_are_independent",
    "tests/test_streaming_topk.py::test_spacesaving_bounds_under_pressure",
    "tests/test_tree.py::TestForest::test_deterministic_and_salt_sensitivity",
    "tests/test_tree.py::TestForest::test_forest_fits_structure",
    "tests/test_tree.py::TestGBT::test_boosting_reduces_error_beyond_one_tree",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
