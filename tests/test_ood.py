"""OOD query generator contract (VERDICT r7 #1): the 10M serving points
are gated on a DISTRIBUTION-SHIFTED query set — different hash family,
per-dimension shifted/scaled marginals, qids ∉ corpus — mirroring the
reference OOD track's text→image shift (`/root/reference/README.md:30-33`)."""

from __future__ import annotations

import numpy as np

from filter_vectordb_spark.sources.synth import ood_matrix, synth_ood_queries


def _base_matrix(ids: np.ndarray, d: int = 192) -> np.ndarray:
    K1, K3 = 2654435761, 2246822519
    js = np.arange(d, dtype=np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    return (((ids[:, None] * K1) ^ ((js[None, :] + 1) * K3)) >> 11) % 251


def test_ood_matrix_bounds_and_distinctness():
    """Every component is an integer in [0, 255] with d ≤ 192 (the f32
    exactness precondition of knn_join / exact_codes), and rows are
    fully distinct — no rank-deficiency (the v1-generator lesson)."""
    Q = ood_matrix(np.arange(4096))
    assert Q.shape == (4096, 192)
    assert Q.min() >= 0 and Q.max() <= 255
    assert np.array_equal(Q, np.rint(Q))
    assert len(np.unique(Q, axis=0)) == 4096


def test_ood_marginals_shifted_from_corpus():
    """The whole point: per-dimension means/stds must differ materially
    from the corpus's iid-uniform 0..250 marginal (mean ≈ 125, std ≈ 72)
    — and differ ACROSS dimensions (an unaligned second encoder, not a
    global affine shift of the same distribution)."""
    Q = ood_matrix(np.arange(4096)).astype(np.float64)
    B = _base_matrix(np.arange(4096)).astype(np.float64)
    qm, bm = Q.mean(axis=0), B.mean(axis=0)
    # every OOD dimension's support is narrower than the corpus's
    assert (Q.std(axis=0) < 60).all() and (B.std(axis=0) > 65).all()
    # means vary across OOD dimensions (width/offset are j-dependent)
    assert qm.std() > 15, "per-dim means should spread"
    assert bm.std() < 5, "corpus marginals are dimension-independent"


def test_ood_queries_not_in_corpus():
    """qids are query-set ordinals, not corpus ids: no OOD vector may
    equal ANY of the first 100k corpus rows (spot-check at the staged
    fixtures' own prefix scale)."""
    Q = ood_matrix(np.arange(1024))
    corpus = {r.tobytes() for r in _base_matrix(np.arange(100_000))}
    assert all(r.tobytes() not in corpus for r in Q)


def test_synth_ood_queries_matches_numpy_twin(spark):
    """The Spark generator and the closed-form numpy twin (which stages
    ground truth and feeds the recall pins) must agree exactly."""
    pdf = synth_ood_queries(spark, nq=64).orderBy("qid").toPandas()
    got = np.stack(pdf["qemb"].to_numpy()).astype(np.int64)
    want = ood_matrix(pdf["qid"].to_numpy())
    assert np.array_equal(got, want)
