"""yfcc-scale filtered serving index (index/filteridx) — route coverage
and exactness against the brute-force scan on the dyadic-Zipf tag model
(`sources/synth.synth_yfcc_base`)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from filter_vectordb_spark.index.filteridx import (
    _route,
    build_filtered_index,
    filtered_search,
    index_is_built,
)
from filter_vectordb_spark.sources.synth import (
    YFCC_VOCAB,
    _dedup_rows,
    synth_yfcc_base,
    synth_yfcc_queries,
    yfcc_draws,
)

N = 20_000
MIN_FREQ = 0.01  # at 20k docs: levels 0..4 frequent, pairs of hot tags built


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fidx") / "yfcc20k")
    base = synth_yfcc_base(spark, n=N)
    build_filtered_index(base, out, min_freq=MIN_FREQ, pair_min_freq=MIN_FREQ)
    assert index_is_built(out)
    return out, base


def test_yfcc_tag_model_shape():
    """Closed-form draws: Zipf profile, vocabulary bound, order-
    preserving dedup."""
    T = yfcc_draws(np.arange(50_000, dtype=np.int64))
    assert T.min() >= 0 and T.max() <= YFCC_VOCAB - 1
    keep = _dedup_rows(T)
    # avg ~4 distinct tags/doc (collisions only among the hot few)
    assert 3.9 <= keep.sum() / 50_000 <= 4.0
    cnt = np.bincount(T[keep].ravel(), minlength=YFCC_VOCAB)
    # tag 0 (level 0) covers ~4/18 of docs; level-6 tags ~4/(18·64)
    assert 0.18 <= cnt[0] / 50_000 <= 0.25
    lvl6 = cnt[63:127]
    assert 0.5 * 4 / (18 * 64) <= lvl6.mean() / 50_000 <= 2 * 4 / (18 * 64)
    # dedup keeps first occurrence: no row repeats a tag
    flat_rows = [row[m] for row, m in zip(T[:1000], keep[:1000])]
    assert all(len(set(r.tolist())) == len(r) for r in flat_rows)


def test_yfcc_queries_tag_mix(spark):
    q = synth_yfcc_queries(spark, nq=64).toPandas().sort_values("qid")
    nsel = q["qtags"].map(len).to_numpy()
    qids = q["qid"].to_numpy()
    # even qids carry 1 tag, odd up to 2 (capped at distinct draws)
    assert (nsel[qids % 2 == 0] == 1).all()
    assert (nsel[qids % 2 == 1] <= 2).all() and (nsel >= 1).all()
    # query tags are the query DOC's first distinct draws → ≥1 match
    T = yfcc_draws(qids)
    keep = _dedup_rows(T)
    for row, m, tags, k in zip(T, keep, q["qtags"], 1 + qids % 2):
        expect = row[m][: int(k)].tolist()
        assert [int(x) for x in tags] == [int(x) for x in expect]


def test_route_rules():
    ndoc = {0: 5000, 1: 2500, 200: 40, 300: 7}
    pairs = {(0, 1)}
    tag_files = {0: ["f0"], 1: ["f1"]}
    qtags = [[0, 1], [1, 0], [0], [0, 200], [200, 300], [300], [], [999], [1, 200]]
    r_pair, r_tag, r_meta, tag_col, other_col = _route(
        qtags, ndoc, thr=100.0, pairs=pairs, tag_files=tag_files
    )
    assert r_pair == [0, 1]  # built pair, order-insensitive
    assert r_tag == [2]  # single frequent tag
    assert tag_col[2] == 0 and other_col[2] == -1
    # rare rarer tag → metadata-first (incl. empty + unknown tags)
    assert r_meta == [3, 4, 5, 6, 7, 8]


def test_filtered_search_matches_bruteforce(spark, built):
    """End-to-end exactness: every route vs the fused brute-force scan
    (operators/filtered_knn.filtered_knn_scan) on the same corpus."""
    from filter_vectordb_spark.index.filteridx import _load_routing
    from filter_vectordb_spark.operators.filtered_knn import filtered_knn_scan

    out, base = built
    q = synth_yfcc_queries(spark, nq=96)
    got = (
        filtered_search(spark, out, q, k=10)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    want = (
        filtered_knn_scan(q, base, 10)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["qid", "id", "rank"]], want[["qid", "id", "rank"]]
    )
    np.testing.assert_allclose(got["dist"], want["dist"], rtol=0, atol=0)
    # the batch must exercise every route at this size, or the test
    # silently shrinks to one path
    ndoc, n_base, min_freq, _off, pair_files, tag_files, _C, _hx = _load_routing(
        spark, out
    )
    qpdf = q.toPandas()
    r_pair, r_tag, r_meta, _, _ = _route(
        qpdf["qtags"], ndoc, min_freq * n_base, pair_files, tag_files
    )
    assert r_pair and r_tag and r_meta


def test_filtered_search_edge_queries(spark, built):
    """Empty conjunction = unfiltered exact k-NN; unknown tag = absent."""
    from filter_vectordb_spark.operators.knn import knn_join

    out, base = built
    qe = synth_yfcc_queries(spark, nq=2).select(
        "qid",
        "qemb",
        F.when(F.col("qid") == 0, F.array().cast("array<int>"))
        .otherwise(F.array(F.lit(YFCC_VOCAB + 5)))
        .alias("qtags"),
    )
    got = filtered_search(spark, out, qe, k=5).toPandas()
    assert set(got["qid"]) == {0}  # qid 1's tag matches nothing
    want = knn_join(
        qe.filter(F.col("qid") == 0), base, 5, metric="l2"
    ).toPandas()
    g0 = got.sort_values("rank")
    assert g0["id"].tolist() == want.sort_values("rank")["id"].tolist()


def test_probed_full_probe_equals_exact(spark, built):
    """nprobe ≥ nlist must reproduce the exact route bit-for-bit — every
    list probed ⇒ the same rows scored with the same f64 assembly (the
    knn_ip_1m_nq8 full-probe discipline)."""
    import json

    out, _base = built
    with open(f"{out}/meta.json") as fh:
        nlist = json.load(fh)["nlist"]
    q = synth_yfcc_queries(spark, nq=64)
    exact = (
        filtered_search(spark, out, q, k=10)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    full = (
        filtered_search(spark, out, q, k=10, nprobe=nlist)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, full)


def test_probed_recall_and_exact_subscores(spark, built):
    """Small-nprobe serving: every returned (qid, id, dist) is a TRUE
    exact distance (pruning loses candidates, never corrupts scores),
    and tag-route recall against the exact route is sane (> 0.5 at
    nprobe=4 on the 20k fixture) and 1.0-bounded."""
    out, _base = built
    q = synth_yfcc_queries(spark, nq=64)
    exact = filtered_search(spark, out, q, k=10).toPandas()
    approx = filtered_search(spark, out, q, k=10, nprobe=4).toPandas()
    ex = exact.set_index(["qid", "id"])["dist"]
    ap = approx.set_index(["qid", "id"])["dist"]
    shared = ap.index.intersection(ex.index)
    assert len(shared) > 0
    np.testing.assert_allclose(ap.loc[shared], ex.loc[shared], rtol=0, atol=0)
    # tie-aware recall: an approx id counts when its dist ties-or-beats
    # the exact kth for its query
    kth = exact.groupby("qid")["dist"].max()
    nex = exact.groupby("qid").size()
    hits = sum(
        1 for r in approx.itertuples() if r.dist <= kth.loc[r.qid]
    )
    recall = hits / int(nex.sum())
    assert 0.5 < recall <= 1.0, recall


def test_probed_lut_and_fallback():
    """_hit_lists membership: the O(1) LUT gather and the searchsorted
    fallback (huge/negative tag space) must produce identical posting
    lists — including out-of-range and unprobed tags in the flat sweep."""
    from filter_vectordb_spark.index.filteridx import _hit_lists, _probed_lut

    rng = np.random.default_rng(7)
    probed = np.unique(rng.integers(0, 5000, size=64)).astype(np.int64)
    flat = rng.integers(-10, 8000, size=4096).astype(np.int64)
    row_of = rng.integers(0, 512, size=4096).astype(np.int64)
    lut = _probed_lut(probed)
    assert lut is not None
    a = _hit_lists(flat, row_of, probed, lut)
    b = _hit_lists(flat, row_of, probed, None)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # a vocabulary past the LUT bound refuses the table
    assert _probed_lut(np.array([0, 2**40], dtype=np.int64)) is None
    assert _probed_lut(np.array([-3, 7], dtype=np.int64)) is None


def test_three_tag_conjunction(spark, built):
    """R4 with a >2-tag conjunction exercises the per-group intersection
    path beside the vectorized 1-2-tag pair kernel; pandas oracle."""
    out, base = built
    bp = base.select("id", "tags").toPandas()
    pick = next(
        (
            [int(t) for t in r["tags"]][:3]
            for _, r in bp.iterrows()
            if len(r["tags"]) >= 3
        ),
        None,
    )
    assert pick is not None
    ta, tb, tc = pick
    q = synth_yfcc_queries(spark, nq=1).select(
        "qid", "qemb", F.array(F.lit(ta), F.lit(tb), F.lit(tc)).alias("qtags")
    )
    got = filtered_search(spark, out, q, k=10).toPandas()
    cand = {
        int(r["id"])
        for _, r in bp.iterrows()
        if {ta, tb, tc} <= set(map(int, r["tags"]))
    }
    assert set(got["id"]) <= cand and len(got) == min(10, len(cand))
    assert (got.sort_values("rank")["dist"].diff().dropna() >= 0).all()


def test_two_rare_tag_intersection(spark, built):
    """R4 with a 2-tag conjunction of two RARE tags: the in-kernel
    sorted-posting intersection, checked against a pandas oracle."""
    out, base = built
    bp = base.select("id", "tags").toPandas()
    # find a doc with two rare (level ≥ 8 → tag ≥ 255) distinct tags
    pick = None
    for _, r in bp.iterrows():
        rare = [int(t) for t in r["tags"] if int(t) >= 255]
        if len(rare) >= 2:
            pick = (int(r["id"]), rare[0], rare[1])
            break
    assert pick is not None
    _doc, ta, tb = pick
    q = synth_yfcc_queries(spark, nq=1).select(
        "qid", "qemb", F.array(F.lit(ta), F.lit(tb)).alias("qtags")
    )
    got = filtered_search(spark, out, q, k=10).toPandas()
    # pandas oracle: exact candidate set
    cand = {
        int(r["id"])
        for _, r in bp.iterrows()
        if ta in set(map(int, r["tags"])) and tb in set(map(int, r["tags"]))
    }
    assert set(got["id"]) <= cand and len(got) == min(10, len(cand))


def test_route_multi_tag_goes_meta_unconditionally():
    """ADVICE r8 (medium): a >2-tag conjunction whose rarest tag is
    FREQUENT must still route to r_meta — the tag-view route carries
    only (rarer, other) and would silently drop the third conjunct."""
    ndoc = {0: 5000, 1: 2500, 2: 4000}
    tag_files = {0: ["f0"], 1: ["f1"], 2: ["f2"]}
    r_pair, r_tag, r_meta, _tc, _oc = _route(
        [[0, 1, 2]], ndoc, thr=100.0, pairs=set(), tag_files=tag_files
    )
    assert r_meta == [0] and not r_tag and not r_pair


def test_three_frequent_tag_conjunction(spark, built):
    """End-to-end ADVICE r8 regression: a 3-tag conjunction of FREQUENT
    tags (each above the routing threshold) must satisfy ALL three
    conjuncts — the old router sent it down the tag-view path with only
    two."""
    out, base = built
    bp = base.select("id", "tags").toPandas()
    thr = MIN_FREQ * N
    from collections import Counter

    cnt = Counter(int(t) for tags in bp["tags"] for t in tags)
    pick = None
    for _, r in bp.iterrows():
        freq3 = sorted({int(t) for t in r["tags"] if cnt[int(t)] >= thr})
        if len(freq3) >= 3:
            pick = freq3[:3]
            break
    assert pick is not None, "fixture lacks a 3-frequent-tag doc"
    ta, tb, tc = pick
    q = synth_yfcc_queries(spark, nq=1).select(
        "qid", "qemb", F.array(F.lit(ta), F.lit(tb), F.lit(tc)).alias("qtags")
    )
    got = filtered_search(spark, out, q, k=10).toPandas()
    cand = {
        int(r["id"])
        for _, r in bp.iterrows()
        if {ta, tb, tc} <= set(map(int, r["tags"]))
    }
    assert set(got["id"]) <= cand and len(got) == min(10, len(cand))


def test_hit_lists_large_negative_tag():
    """ADVICE r8 (low): a negative flat tag with magnitude beyond the
    LUT length must not throw — and matches nothing either way."""
    from filter_vectordb_spark.index.filteridx import _hit_lists, _probed_lut

    probed = np.array([3, 7, 9], dtype=np.int64)
    lut = _probed_lut(probed)
    flat = np.array([-100000, 3, -2, 9, 7, 3], dtype=np.int64)
    row_of = np.array([0, 1, 2, 3, 4, 5], dtype=np.int64)
    a = _hit_lists(flat, row_of, probed, lut)
    b = _hit_lists(flat, row_of, probed, None)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # the negative rows never appear in any posting list
    assert set(a[1].tolist()) == {1, 3, 4, 5}


def test_decode_scratch_poison(monkeypatch):
    """VERDICT r8 #3: under FVDB_DECODE_POISON=1, a view held across
    _decode calls reads NaN — the scratch-aliasing contract is enforced
    in pytest instead of trusted."""
    import pyarrow as pa

    from filter_vectordb_spark.index.filteridx import _DECODE_SCRATCH, _decode

    codes = pa.array(
        [np.full(4, i, dtype=np.int8) for i in range(3)],
        type=pa.list_(pa.int8()),
    )
    off = np.zeros(4, dtype=np.float64)
    monkeypatch.setenv("FVDB_DECODE_POISON", "1")
    _DECODE_SCRATCH.clear()
    X1 = _decode(codes, None, 3, off, True)
    assert X1[1, 0] == 1.0
    X2 = _decode(codes, None, 3, off, True)
    assert np.isnan(X1).all()  # stale view tripped
    assert X2[2, 0] == 2.0
    monkeypatch.delenv("FVDB_DECODE_POISON")
    _DECODE_SCRATCH.clear()


def test_partials_compact_equivalence():
    """ADVICE r8 (low): compaction keeps exactly the per-qid top-k the
    final task_topk_merge would select, and is a no-op under the cap."""
    from filter_vectordb_spark.index.filteridx import _partials_compact
    from filter_vectordb_spark.operators.knn import task_topk_merge

    rng = np.random.default_rng(11)
    qs = [rng.integers(0, 8, size=500).astype(np.int64) for _ in range(4)]
    is_ = [rng.integers(0, 10_000, size=500).astype(np.int64) for _ in range(4)]
    ds = [rng.random(500) for _ in range(4)]
    ref = task_topk_merge(
        np.concatenate(qs), np.concatenate(is_), np.concatenate(ds), 10, False
    )
    cq, ci, cd = list(qs[:1]), list(is_[:1]), list(ds[:1])
    for j in range(1, 4):
        cq.append(qs[j]), ci.append(is_[j]), cd.append(ds[j])
        cq, ci, cd = _partials_compact(cq, ci, cd, 10, cap=600)
    assert sum(a.size for a in cd) <= 600
    got = task_topk_merge(
        np.concatenate(cq), np.concatenate(ci), np.concatenate(cd), 10, False
    )
    assert got.equals(ref)
    # under the cap: identity, no concatenation
    same = _partials_compact(list(qs), list(is_), list(ds), 10, cap=10**9)
    assert len(same[0]) == 4


def test_meta_gather_plan_matches_sweep(spark, built):
    """VERDICT r8 #1c: the shuffle-based posting-gather plan and the
    direct-read sweep must return IDENTICAL results (ids, ranks, and
    bit-equal distances) — routing between them is purely a cost
    decision."""
    out, _base = built
    q = synth_yfcc_queries(spark, nq=64)
    sweep = (
        filtered_search(spark, out, q, k=10, meta_plan="sweep")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    gather = (
        filtered_search(spark, out, q, k=10, meta_plan="gather")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        sweep[["qid", "id", "rank"]], gather[["qid", "id", "rank"]]
    )
    np.testing.assert_allclose(sweep["dist"], gather["dist"], rtol=0, atol=0)


def test_meta_auto_routing_threshold(spark, built):
    """auto picks gather only when the estimated candidate volume is
    under GATHER_MAX_CAND_FRAC of the corpus — a hyper-selective
    1-query batch routes to gather and still matches the forced sweep."""
    from filter_vectordb_spark.index.filteridx import (
        GATHER_MAX_CAND_FRAC,
        _load_routing,
    )

    out, _base = built
    ndoc, n_base, *_rest = _load_routing(spark, out)
    # the rarest observed tag: est = ndoc[tag] must clear the threshold
    rare_tag, rare_n = min(ndoc.items(), key=lambda kv: kv[1])
    assert rare_n <= GATHER_MAX_CAND_FRAC * n_base
    q = synth_yfcc_queries(spark, nq=1).select(
        "qid", "qemb", F.array(F.lit(int(rare_tag))).alias("qtags")
    )
    auto = filtered_search(spark, out, q, k=10).toPandas()
    sweep = filtered_search(spark, out, q, k=10, meta_plan="sweep").toPandas()
    a = auto.sort_values("rank").reset_index(drop=True)
    s = sweep.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, s)
    assert len(a) == min(10, rare_n)


def test_meta_bin_matches_parquet_sweep(spark, built):
    """The memmap sidecar kernel (_score_meta_bin) and the parquet sweep
    (_score_meta) must return identical results — ids, ranks, bit-equal
    distances.  The sidecar is a derived serving artifact, never a
    semantic change."""
    import os

    out, _base = built
    q = synth_yfcc_queries(spark, nq=64)
    markers = [
        f"{out}/meta_bin/_SUCCESS.json",
        f"{out}/tag_bin/_SUCCESS.json",
    ]
    for m in markers:
        assert os.path.exists(m), "build_filtered_index must build sidecars"
    with_bin = (
        filtered_search(spark, out, q, k=10, meta_plan="sweep")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    # exercise BOTH probe modes on both storage paths: the exact and
    # the nprobe-gated tag routes must be source-agnostic too
    with_bin_p = (
        filtered_search(spark, out, q, k=10, nprobe=4, meta_plan="sweep")
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    from filter_vectordb_spark.index import filteridx as fx

    for m in markers:
        os.rename(m, m + ".hide")
    fx._TAG_BIN_CACHE.clear()
    try:
        without = (
            filtered_search(spark, out, q, k=10, meta_plan="sweep")
            .toPandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
        without_p = (
            filtered_search(spark, out, q, k=10, nprobe=4, meta_plan="sweep")
            .toPandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
    finally:
        for m in markers:
            os.rename(m + ".hide", m)
        fx._TAG_BIN_CACHE.clear()
    pd.testing.assert_frame_equal(
        with_bin_p[["qid", "id", "rank"]], without_p[["qid", "id", "rank"]]
    )
    np.testing.assert_allclose(
        with_bin_p["dist"], without_p["dist"], rtol=0, atol=0
    )
    pd.testing.assert_frame_equal(
        with_bin[["qid", "id", "rank"]], without[["qid", "id", "rank"]]
    )
    np.testing.assert_allclose(
        with_bin["dist"], without["dist"], rtol=0, atol=0
    )


def test_poison_on_e2e_serving(spark, built):
    """VERDICT r9 missing #2: the full serving path (both probe modes,
    bins present) runs with FVDB_DECODE_POISON=1 propagated to the
    Python workers — a kernel holding a _decode view across units would
    serve NaN distances and fail the equality, not silently serve stale
    vectors.  (test_decode_scratch_poison pins the mechanism; this pins
    that no serve kernel violates the contract end-to-end.)"""
    out, _base = built
    q = synth_yfcc_queries(spark, nq=64)
    clean = (
        filtered_search(spark, out, q, k=10)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    clean_p = (
        filtered_search(spark, out, q, k=10, nprobe=4)
        .toPandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    env = spark.sparkContext.environment
    env["FVDB_DECODE_POISON"] = "1"
    try:
        poisoned = (
            filtered_search(spark, out, q, k=10)
            .toPandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
        poisoned_p = (
            filtered_search(spark, out, q, k=10, nprobe=4)
            .toPandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
    finally:
        del env["FVDB_DECODE_POISON"]
    assert not poisoned["dist"].isna().any()
    pd.testing.assert_frame_equal(clean, poisoned)
    pd.testing.assert_frame_equal(clean_p, poisoned_p)


def test_gather_candidate_join_is_broadcast(spark, built):
    """VERDICT r9 wrong #4: under the auto threshold the gather plan's
    candidate equi-join must be a BroadcastHashJoin with the bounded
    candidate side built — never an O(corpus) sort-merge shuffle of the
    codes table (the cost model the plan exists for at 100x scale)."""
    from filter_vectordb_spark.index.filteridx import (
        _load_routing,
        _score_meta_gather,
    )
    from filter_vectordb_spark.plans.audit import assert_broadcast_join, physical_plan

    out, _base = built
    _ndoc, _n, _mf, off, *_rest = _load_routing(spark, out)
    qpdf = synth_yfcc_queries(spark, nq=8).toPandas()
    df = _score_meta_gather(spark, f"{out}/codes", qpdf, 10, off)
    # two broadcasts: the exploded query side inside
    # conjunctive_candidates AND the candidate (qid, id) side
    assert_broadcast_join(df, at_least=2)
    assert "SortMergeJoin" not in physical_plan(df)
    # the explicit no-broadcast escape hatch still plans and returns the
    # same rows (join strategy is left to Catalyst/AQE there — at
    # fixture scale it may still pick broadcast on size stats, so only
    # the hinted path's strategy is pinned)
    df2 = _score_meta_gather(
        spark, f"{out}/codes", qpdf, 10, off, broadcast_cand=False
    )

    def topk(pdf):  # the outputs are per-task partials — reduce first
        return (
            pdf.sort_values(["qid", "dist", "id"])
            .groupby("qid")
            .head(10)
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(topk(df.toPandas()), topk(df2.toPandas()))


def test_tag_units_parquet_fallback_for_missing_manifest_tag(spark):
    """ADVICE r9: a routed tag present in tag_files but absent from the
    bin manifest must fall back to parquet row-group units for that tag
    (a stale/partial sidecar otherwise silently returned no rows)."""
    from filter_vectordb_spark.index.filteridx_kernels import _tag_units

    groups = {7: [(-1, None, None)], 9: [(-1, None, None)]}
    bins = ("/bins", {"7": [("7.part0", 100)]}, 16)
    # tag 9 missing from the manifest → its parquet files are used
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    d = tempfile.mkdtemp()
    p9 = os.path.join(d, "t9.parquet")
    pq.write_table(pa.table({"id": [1, 2]}), p9)
    tag_files = {7: ["unused.parquet"], 9: [p9]}
    units, bin_dir, bin_d = _tag_units(spark, groups, tag_files, bins)
    assert bin_dir == "/bins" and bin_d == 16
    bin_units = [u for u in units if u[2] == -1]
    pq_units = [u for u in units if u[2] >= 0]
    assert bin_units == [(7, "7.part0", -1, 100)]
    assert len(pq_units) >= 1 and all(u[0] == 9 and u[1] == p9 for u in pq_units)
    # bins absent entirely → all parquet
    units2, bd2, _ = _tag_units(spark, {9: groups[9]}, tag_files, None)
    assert bd2 is None and all(u[2] >= 0 for u in units2)


def test_upgrade_tag_bin_bounds_backfills(spark, built):
    """Pre-r10 sidecar layouts lack `.bounds.npy`; the manifest load
    backfills them driver-side, and the backfilled bounds equal the
    build-time searchsorted."""
    import glob as g
    import json
    import os

    from filter_vectordb_spark.index import filteridx as fx

    out, _base = built
    bfiles = sorted(g.glob(f"{out}/tag_bin/*.bounds.npy"))
    assert bfiles, "build_tag_bins must write bounds sidecars"
    victim = bfiles[0]
    lst = np.load(victim.replace(".bounds.npy", ".lst.npy"))
    with open(f"{out}/meta.json") as fh:
        nlist = int(json.load(fh)["nlist"])
    want = np.searchsorted(lst, np.arange(nlist + 1, dtype=np.int64))
    os.remove(victim)
    fx._TAG_BIN_CACHE.clear()
    assert fx._tag_bins(out) is not None
    got = np.load(victim)
    np.testing.assert_array_equal(got, want)
    assert len(got) == nlist + 1


def test_upgrade_tag_bin_bounds_survives_corrupt_lst(spark, built):
    """ADVICE r10: np.load of a truncated/corrupt .lst.npy raises
    ValueError, not OSError — the backfill must swallow it and leave
    manifest load (and serving) alive, per its own contract."""
    import glob as g
    import os

    from filter_vectordb_spark.index import filteridx as fx

    out, _base = built
    bfiles = sorted(g.glob(f"{out}/tag_bin/*.bounds.npy"))
    assert bfiles
    victim = bfiles[0]
    lst_path = victim.replace(".bounds.npy", ".lst.npy")
    keep = open(lst_path, "rb").read()
    try:
        os.remove(victim)  # force the backfill path for this file
        with open(lst_path, "wb") as fh:
            fh.write(b"\x93NUMPY garbage not a real header")
        fx._TAG_BIN_CACHE.clear()
        # must not raise, and must not have written a bounds file
        assert fx._tag_bins(out) is not None
        assert not os.path.exists(victim)
    finally:
        with open(lst_path, "wb") as fh:
            fh.write(keep)
        fx._TAG_BIN_CACHE.clear()
        assert fx._tag_bins(out) is not None  # restored layout backfills
        assert os.path.exists(victim)


def test_rebuild_in_place_retires_stale_sidecars(spark, tmp_path):
    """ADVICE r9 medium: rebuilding an index into the same out_dir must
    not leave the previous build's *_bin sidecars preferred over the
    fresh parquet — serving after a rebuild answers from the NEW corpus."""
    import os

    out = str(tmp_path / "rebuilt")
    base1 = synth_yfcc_base(spark, n=2000)
    build_filtered_index(base1, out, min_freq=0.01, pair_min_freq=0.01)
    stamp = os.stat(f"{out}/meta_bin/_SUCCESS.json").st_mtime_ns
    # rebuild in place over a DIFFERENT corpus (ids shifted)
    base2 = synth_yfcc_base(spark, n=3000).withColumn(
        "id", F.col("id") + F.lit(1_000_000)
    )
    build_filtered_index(base2, out, min_freq=0.01, pair_min_freq=0.01)
    assert os.stat(f"{out}/meta_bin/_SUCCESS.json").st_mtime_ns != stamp
    from filter_vectordb_spark.index import filteridx as fx

    fx._TAG_BIN_CACHE.clear()
    fx._ROUTE_CACHE.clear()
    q = synth_yfcc_queries(spark, nq=8)
    got = filtered_search(spark, out, q, k=5).toPandas()
    assert len(got) and (got["id"] >= 1_000_000).all(), (
        "stale sidecars served the old corpus"
    )


def test_int8_direct_path_bit_identical(spark, built, monkeypatch):
    """r11 fast path: the probed/meta-bin kernels score q·x = q·c + q·off
    straight off the int8 codes when the f32-exact gate + integral grid
    offset + persisted norms hold — results must be BIT-identical to the
    decode-then-dot path (the split-sum exactness argument in
    _int_off_ok).  Force the slow path via the gate and compare."""
    import pandas as pd

    from filter_vectordb_spark.index import filteridx_kernels as fk

    out, _base = built
    q = synth_yfcc_queries(spark, nq=64)
    # probed mode exercises the probed/meta-bin kernels; exact mode the
    # tagview masked-pair and meta-sweep flat paths
    modes = ({}, {"nprobe": 4})

    def run(kw):
        return (
            filtered_search(spark, out, q, k=10, **kw)
            .toPandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )

    fast = [run(kw) for kw in modes]
    monkeypatch.setattr(fk, "_int_off_ok", lambda off: False)
    for kw, fast_df in zip(modes, fast):
        pd.testing.assert_frame_equal(fast_df, run(kw))
    # the gate itself accepts the fixture's grid (so `fast` above really
    # exercised the int8-direct path, not the fallback twice)
    from filter_vectordb_spark.index.filteridx import _load_routing

    off = _load_routing(spark, out)[3]
    monkeypatch.undo()
    assert fk._int_off_ok(off), "fixture grid must take the fast path"


def test_int8_pair_scores_segment_form_bit_identical():
    """r12 kernel form (guide §4.2): sorted query-grouped qidx takes the
    per-segment matrix-vector einsum; short runs and unsorted qidx take
    the chunked pair-gather einsum.  Both forms regroup the same exact-
    integer f32 dots, so outputs must be BIT-identical across the
    branch: force each branch via the _SEG_MIN_MEAN cutoff and compare."""
    from filter_vectordb_spark.index import filteridx_kernels as fk

    rng = np.random.default_rng(5)
    n, d, nq = 4096, 192, 37
    C8 = rng.integers(-128, 128, size=(n, d), dtype=np.int8)
    Qm = rng.integers(0, 256, size=(nq, d)).astype(np.float32)

    def chunked_ref(qidx, rows):
        return np.einsum("ij,ij->i", Qm[qidx], C8[rows]).astype(np.float64)

    # long sorted runs (segment branch), incl. an empty-run-free mix of
    # run lengths above and below the cutoff
    lens = rng.integers(1, 4 * fk._SEG_MIN_MEAN, size=nq)
    qidx = np.repeat(np.arange(nq, dtype=np.int64), lens)
    rows = rng.integers(0, n, size=len(qidx))
    got = fk._int8_pair_scores(Qm, qidx, C8, rows, chunk=1000)
    assert np.array_equal(got, chunked_ref(qidx, rows))
    # unsorted qidx must fall back (and still be exact)
    perm = rng.permutation(len(qidx))
    got = fk._int8_pair_scores(Qm, qidx[perm], C8, rows[perm], chunk=1000)
    assert np.array_equal(got, chunked_ref(qidx[perm], rows[perm]))
    # short runs: below the mean cutoff the gather branch runs
    lens = rng.integers(1, max(2, fk._SEG_MIN_MEAN // 8), size=nq)
    qidx = np.repeat(np.arange(nq, dtype=np.int64), lens)
    rows = rng.integers(0, n, size=len(qidx))
    got = fk._int8_pair_scores(Qm, qidx, C8, rows, chunk=1000)
    assert np.array_equal(got, chunked_ref(qidx, rows))
    # empty input
    e = np.empty(0, dtype=np.int64)
    assert len(fk._int8_pair_scores(Qm, e, C8, e)) == 0
