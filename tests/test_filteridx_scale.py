"""10M-scale pins for the yfcc filter-track operating point — the
test_sq discipline: the registered approximate row must clear its
recall gate against the exact router on the staged fixture (stages on
first run; later runs serve from the /tmp cache like every other scale
pin)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_yfcc_10m_ivf_recall_gate(spark):
    """TAG-ROUTE recall of the registered nprobe operating point must
    clear 0.9 (the track's gate) on a 256-query sample, tie-aware (an
    id counts when its exact dist ties-or-beats the exact kth — every
    probed dist IS exact, pytest-pinned at small scale)."""
    from filter_vectordb_spark.index.filteridx import (
        _load_routing,
        _route,
        filtered_search,
    )
    from filter_vectordb_spark.queries.fixtures import (
        _yfcc10m_index,
        _yfcc_queries_staged,
    )
    from filter_vectordb_spark.queries.scale import _YFCC_10M_NPROBE

    out = _yfcc10m_index(spark)
    # one even + one odd qid per stride of 16 → 1,024 queries with the
    # true 1-/2-tag mix (even qids are 1-tag by construction), DISJOINT
    # from the curve's selection sample (qid % 16 < 2) so the gate is
    # verified out-of-sample; a first 256-query cut measured 0.8962 —
    # sampling noise at a ~2,500-slot denominator is why VERDICT r7 #3
    # demanded wide samples near the gate
    q = _yfcc_queries_staged(spark, nq=8192).filter(
        (F.col("qid") % 16 >= 4) & (F.col("qid") % 16 < 6)
    )
    exact = filtered_search(spark, out, q, 10).toPandas()
    approx = filtered_search(spark, out, q, 10, nprobe=_YFCC_10M_NPROBE).toPandas()
    ndoc, n_base, min_freq, _off, pair_files, tag_files, _C, _hx = _load_routing(
        spark, out
    )
    qpdf = q.select("qid", "qtags").toPandas()
    _rp, r_tag, _rm, _tc, _oc = _route(
        qpdf["qtags"], ndoc, min_freq * n_base, pair_files, tag_files
    )
    tag_qids = set(qpdf.iloc[r_tag]["qid"].astype(int))
    assert len(tag_qids) >= 32, "sample must hit the tag-view route"
    kth = exact.groupby("qid")["dist"].max().to_dict()
    n_ex = exact.groupby("qid").size().to_dict()
    den = sum(v for k_, v in n_ex.items() if int(k_) in tag_qids)
    hits = sum(
        1
        for r in approx.itertuples()
        if int(r.qid) in tag_qids and r.dist <= kth[r.qid]
    )
    recall = hits / den
    assert recall >= 0.9, f"tag-route recall {recall:.4f} below the 0.9 gate"
