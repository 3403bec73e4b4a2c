from __future__ import annotations

import duckdb
import pytest

from filter_vectordb_spark import TABLES, get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def assert_frames_match(spark_df, duck_rel, float_cols: tuple[str, ...] = ()):
    """Mirror the driver's t2 compare: sort columns by name, order-insensitive
    row compare, exact values (floats must be hash-stable by construction)."""
    import pandas as pd

    left = spark_df.toPandas()
    right = duck_rel.df()
    assert sorted(left.columns) == sorted(right.columns), (
        f"schema mismatch: {sorted(left.columns)} vs {sorted(right.columns)}"
    )
    cols = sorted(left.columns)
    left = left[cols].sort_values(cols).reset_index(drop=True)
    right = right[cols].sort_values(cols).reset_index(drop=True)
    assert len(left) == len(right), f"row count {len(left)} vs {len(right)}"
    for c in cols:
        lc, rc = left[c], right[c]
        if c in float_cols:
            pd.testing.assert_series_equal(
                lc.astype("float64"), rc.astype("float64"), check_names=False
            )
        else:
            lv = lc.astype(str).to_numpy()
            rv = rc.astype(str).to_numpy()
            mism = (lv != rv).nonzero()[0]
            assert len(mism) == 0, (
                f"column {c}: {len(mism)} mismatches, first at row {mism[0]}: "
                f"{lv[mism[0]]!r} vs {rv[mism[0]]!r}"
            )
