"""Local mirror of the driver's DuckDB-oracle gate: every SQL-backed query
in the registry is run through Ray AND DuckDB on the same parquet tables and
compared (row count, column names, order-insensitive values)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(ray_df, duck_df, name):
    if not isinstance(ray_df, pd.DataFrame):
        ray_df = ray_df.to_pandas()
    a, b = normalize(ray_df), normalize(duck_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            ok = np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=1e-9, equal_nan=True)
        else:
            ok = a[c].equals(b[c])
        assert ok, f"{name}: column {c} differs\nray:\n{a[c].head()}\nduck:\n{b[c].head()}"


@pytest.fixture(scope="module")
def registry(ray_session):
    from citygml2objv2_ray import (  # noqa: F401
        relational,
        relational_ext,
        relational_ml,
        relational_stats,
        streaming,
    )

    return relational.REGISTRY, relational.ORACLE


SF = "/root/testdata/sf0.001"


def test_all_sql_backed_queries_match_oracle(registry):
    reg, oracle = registry
    con = duck(SF)
    failures = []
    for name, sql in oracle.items():
        try:
            ray_res = reg[name](SF)
            duck_res = con.execute(sql).df()
            compare(ray_res, duck_res, name)
        except AssertionError as e:
            failures.append(str(e))
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: raised {type(e).__name__}: {e}")
    assert not failures, "\n\n".join(failures)


def test_rows_only_queries_run(registry):
    reg, oracle = registry
    for name, fn in reg.items():
        if name in oracle:
            continue
        res = fn(SF)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        assert res is not None and len(res.columns) > 0, name


def test_langid_deterministic_and_sane(registry):
    # NOTE: the testdata `lang` column is random relative to the synthetic
    # text (verified: word soup is English-ish regardless of label), so
    # accuracy vs that column is meaningless — we assert determinism and
    # that the English-ish word soup maps to en/unknown.
    reg, _ = registry
    a = reg["q_langid"](SF)
    b = reg["q_langid"](SF)
    pd.testing.assert_frame_equal(a, b)
    assert set(a.lang_pred.unique()) <= {"en", "unknown", "de", "fr", "es"}
    assert (a.lang_pred == "en").mean() > 0.5  # the soup contains 'the'/'a'
