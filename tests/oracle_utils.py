"""Local mirror of the driver's Ray-vs-DuckDB comparison."""

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def to_pandas(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = df[c].astype("float64").round(9)
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def assert_matches(ray_result, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = canonicalize(to_pandas(ray_result))
    want = canonicalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = a.astype(float)
            bf = b.astype(float)
            both_nan = np.isnan(af) & np.isnan(bf)
            ok = both_nan | (np.abs(af - bf) <= 1e-6 * np.maximum(1.0, np.abs(bf)))
            assert ok.all(), f"{name}.{c}: value mismatch at rows {np.nonzero(~ok)[0][:5]}"
        else:
            eq = a == b
            assert eq.all(), (
                f"{name}.{c}: mismatch at rows {np.nonzero(~eq)[0][:5]}: "
                f"{a[~eq][:3]} vs {b[~eq][:3]}"
            )
