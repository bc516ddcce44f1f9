"""Local mirror of the driver gate for the WORLD-backed SQL oracles
(``__ray_entry__.world_oracle_sql``): each Ray query and its DuckDB twin
run over the same synthetic-world parquet at sf0.001 and must match on
columns, row count and values (the driver runs the identical SQL at
sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def world_gate(ray_session):
    import __ray_entry__ as entry
    from citygml2objv2_ray import worlds

    worlds.world_paths(worlds.sf_of_dir(SF))  # materialize for read_parquet()
    return entry.queries(), entry.world_oracle_sql(worlds.sf_of_dir(SF))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_world_oracles_match(world_gate):
    reg, oracles = world_gate
    con = duckdb.connect()
    failures = []
    for name, sql in oracles.items():
        try:
            ray_df = reg[name](SF)
            if not isinstance(ray_df, pd.DataFrame):
                ray_df = ray_df.to_pandas()
            duck_df = con.execute(sql).df()
            a, b = _normalize(ray_df), _normalize(duck_df)
            assert list(a.columns) == list(b.columns), f"{name}: cols {list(a.columns)} != {list(b.columns)}"
            assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
            for c in a.columns:
                if pd.api.types.is_float_dtype(a[c]):
                    ok = np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=1e-9, equal_nan=True)
                else:
                    ok = a[c].equals(b[c])
                assert ok, f"{name}: column {c} differs\nray:\n{a[c].head()}\nduck:\n{b[c].head()}"
        except AssertionError as e:
            failures.append(str(e))
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: raised {type(e).__name__}: {e}")
    assert not failures, "\n\n".join(failures)
