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
