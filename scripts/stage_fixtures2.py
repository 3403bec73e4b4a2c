#!/usr/bin/env python
"""Stage the fixtures the first pass missed (ordered so the heavy
builds run last, when the concurrent test-suite build has drained).
Idempotent like scripts/stage_fixtures.py."""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    from filter_vectordb_spark import get_spark
    from filter_vectordb_spark.queries import fixtures as fx

    spark = get_spark("stage_fixtures2")

    def run(label, fn, *args):
        t0 = time.perf_counter()
        try:
            fn(spark, *args)
            print(f"stage: {label} {time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as exc:
            print(f"stage: {label} FAILED: {exc}", file=sys.stderr, flush=True)

    run("yfcc100k_index", fx._yfcc100k_index)
    run("yfcc_queries_8192", fx._yfcc_queries_8192)
    run("sparse1m_terms", fx._synth_sparse1m_terms_dir)
    run("sparse1m_queries", fx._synth_sparse1m_queries)
    run("msturing1m_base", fx._synth_msturing1m)
    run("msturing1m_clustered", fx._synth_msturing1m_clustered)
    run("sparse8m84_terms", fx._synth_sparse8m84_terms_dir)
    run("sparse8m84_skewed", fx._synth_sparse8m84_skewed_terms_dir)
    run("msturing10m_base", fx._synth_msturing10m)
    run("msturing10m_clustered", fx._synth_msturing10m_clustered)
    run("ivfsq_10m", fx._ivfsq_10m)
    # the concurrent pytest run may be building this one — only build
    # if nobody has finished it AND nothing has touched it recently
    idx = "/tmp/fvdb_index_cache/yfcc10m_v2/fidx_v4"
    if not os.path.exists(f"{idx}/meta.json"):
        run("yfcc10m_index", fx._yfcc10m_index)
    else:
        print("stage: yfcc10m_index already built", flush=True)
    print("stage: all done", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
