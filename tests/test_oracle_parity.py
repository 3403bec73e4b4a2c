"""Differential test vs DuckDB for every registered (query, oracle) pair —
the same check the driver runs at sf0.01 (here at sf0.001 for speed).

This mirrors the reference's own correctness methodology: exact ground
truth comparison (`filter/uint8_knn_file/test.py:14-24` checks the SIMD
kernel elementwise against faiss.knn).
"""

from __future__ import annotations

import pytest

from filter_vectordb_spark import registry
from tests.conftest import SF_DIR, assert_frames_match

ORACLE_CASES = sorted(registry.ORACLES)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    rel = duck.sql(registry.ORACLES[name])
    assert_frames_match(df, rel)


def test_all_queries_have_callables():
    for name in registry.ORACLES:
        assert name in registry.QUERIES
