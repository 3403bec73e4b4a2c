"""Synthetic scale fixtures (bench-honesty track).

The driver fixtures top out at 2,000 vectors — three orders of magnitude
below the reference's yfcc-10M filter track (10M × 192-d uint8, 1-2 tag
conjunctions, BASELINE.md row 1).  This module generates a deterministic
100k × 192-d uint8 base with the same tag-frequency profile as
sources/vectors.py (10 coarse / 7 mid / 13 fine tags), so the filtered
k-NN stack can be measured at a scale where per-query work, not Spark
constants, dominates — the closest apples-to-apples point the container
allows.

Values are a Knuth-multiplicative-hash pattern: distance work is
data-independent, generation is vectorized and instant, and every value
is recomputable anywhere (no RNG state to ship).

Generator v2 (round 5): the v1 pattern `(id·K1 + j·K2 + (id>>7)) % 251`
was rank-deficient — each row was fully determined by
`(id·K1 + (id>>7)) mod 251`, so the "100k" corpus contained only 251
DISTINCT vectors, each repeated ~400×.  That made every ANN measurement
on it degenerate (IVF recall trivially 1.0 — the top-k were copies of
one vector) and top-k tie-breaking ill-defined.  v2 XORs a per-(id,j)
cross term before the modulus, giving 100k fully distinct rows with
uniform-ish marginals; it stays closed-form and SQL-recomputable (the
DuckDB oracle of filtered_knn_100k_nq32 regenerates it exactly).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.functions.signature import sig_from_tags

SCALE_N = 100_000
SCALE_D = 192
# 8k queries: large enough that per-job Spark constants amortize (QPS
# scales ~linearly with batch until compute-bound — see docs/RESULTS_r2.md)
SCALE_NQ = 8_192

_K1 = 2654435761
_K2 = 40503
_K3 = 2246822519  # v2 cross-term multiplier (xxhash prime)

#: bump when the generator changes — cache keys embed it so stale
#: synth-index caches from an older generator can never serve
SYNTH_VERSION = "v2"


def synth_uint8_base(
    spark: SparkSession, n: int = SCALE_N, d: int = SCALE_D
) -> DataFrame:
    """(id, emb ARRAY<INT> in 0..250, tags ARRAY<INT>, sig BIGINT) —
    generated partition-parallel; ~19 MB of vector payload at defaults.
    v2 pattern: ((id·K1 XOR (j+1)·K3) >> 11) % 251 — all rows distinct
    (see module docstring for the v1 rank-251 flaw this fixes)."""

    def gen(it):
        import pandas as pd

        js = np.arange(d, dtype=np.int64)
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            H = (ids[:, None] * _K1) ^ ((js[None, :] + 1) * _K3)
            E = ((H >> 11) % 251).astype(np.int32)
            yield pd.DataFrame({"id": ids, "emb": list(E)})

    base = (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema="id BIGINT, emb ARRAY<INT>")
    )
    v = F.col("id")
    tags = F.array(
        (v % 10).cast("int"),
        (F.lit(10) + v % 7).cast("int"),
        (F.lit(20) + v % 13).cast("int"),
    )
    return base.withColumn("tags", tags).withColumn("sig", sig_from_tags(tags))


SPARSE_N = 100_000
SPARSE_VOCAB = 30_000
SPARSE_NNZ = 50
SPARSE_NQ = 1_024
SPARSE_Q_NNZ = 20


def sparse_weight_matrix(ids: np.ndarray, nnz: int, profile: str) -> np.ndarray:
    """Closed-form (len(ids), nnz) integer weight block — the numpy twin
    recall checks and oracles recompute through.

    profile="uniform": w ∈ 1..7 uniform — the original fixture shape.
    Under this profile every posting carries similar impact, so
    impact-ordered budget traversal (linscan's algorithm) degenerates
    into a tie-lottery — measured at 8.84M: budgeted recall is low AND
    non-monotone (docs/RESULTS_r8.md §5).

    profile="skewed": the real SPLADE impact shape — a DIVERSE base
    (1..64, hash-distributed, so top scores are distinct instead of
    mass-tied) under a log-quantized heavy tail (~1/8 mid-impact ×16,
    ~1/1024 high-impact ×128; max w = 64·128 = 8192, keeping every
    achievable inner product inside the f32-exact selection bound).
    Top-k inner products are then DECIDED by the impact postings,
    which an impact-ordered traversal visits FIRST: the regime
    linscan's published 101 QPS @ ≥0.9 recall operates in.  Uniform
    ties were the failure mode of the first two calibrations — with
    tied impact cores, the exact ranking hinges on deep low-weight
    postings no budget can reach (docs/RESULTS_r8.md §5)."""
    js = np.arange(nnz, dtype=np.int64)
    base = (ids[:, None] + js[None, :]) % 7 + 1
    if profile == "uniform":
        return base
    if profile != "skewed":
        raise ValueError(f"unknown weight profile: {profile!r}")
    g = (ids[:, None] * _K4) ^ ((js[None, :] + 1) * _K5)
    gb = (g >> 7) & 0xFFF  # boost bits
    base64 = 1 + ((g >> 19) & 0x3F)  # diverse base 1..64
    boost = np.where(gb % 1024 == 0, 128, np.where(gb % 8 == 0, 16, 1))
    return base64 * boost


def synth_sparse_terms(
    spark: SparkSession,
    n: int = SPARSE_N,
    vocab: int = SPARSE_VOCAB,
    nnz: int = SPARSE_NNZ,
    profile: str = "uniform",
) -> DataFrame:
    """(id, term, w) — deterministic SPLADE-shaped sparse corpus: ~nnz
    integer-weighted terms per doc over a `vocab`-sized dimension space
    (the sparse track's scale regime, BASELINE row 2).  Closed-form
    values; collisions within a doc merge by summing weights, mirroring
    term-frequency accumulation.  `profile` picks the weight
    distribution (see sparse_weight_matrix)."""

    def gen(it):
        import pandas as pd

        js = np.arange(nnz, dtype=np.int64)
        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            t = (ids[:, None] * _K1 + js[None, :] * js[None, :] * _K2) % vocab
            w = sparse_weight_matrix(ids, nnz, profile)
            out = pd.DataFrame(
                {
                    "id": np.repeat(ids, nnz),
                    "term": t.ravel(),
                    "w": w.ravel(),
                }
            )
            yield out.groupby(["id", "term"], as_index=False)["w"].sum()

    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema="id BIGINT, term BIGINT, w BIGINT")
    )


def synth_sparse_queries(
    spark: SparkSession,
    nq: int = SPARSE_NQ,
    vocab: int = SPARSE_VOCAB,
    nnz: int = SPARSE_Q_NNZ,
) -> DataFrame:
    """(qid, term, w) — the first nq docs truncated to their heaviest-index
    prefix (nnz terms), the standing sparse query batch."""
    q = synth_sparse_terms(spark, nq, vocab, nnz)
    return q.select(F.col("id").alias("qid"), "term", "w")


# --------------------------------------------- OOD query generator (r8)
# VERDICT r7 #1: the scale points' query batches were the first nq BASE
# vectors themselves — maximally in-distribution, which flattered the
# probe-ranking knee (each query's true neighbors concentrate in exactly
# the lists the query itself ranks first).  The reference's OOD track
# exists to measure the opposite case: queries drawn from a DIFFERENT
# distribution than the corpus (text2image — text-encoder queries
# against image-encoder vectors, `/root/reference/README.md:30-33`).
#
# This generator mirrors that shift with a different hash family AND
# per-dimension shifted/scaled marginals:
#   base:  v[id,j] = ((id·K1 ^ (j+1)·K3) >> 11) % 251   — iid-uniform
#          0..250, identical marginal in every dimension
#   ood:   v[qid,j] = off_j + ((qid·K4 ^ (j+1)·K5) >> 9) % w_j
#          off_j = (7j) % 64,  w_j = 64 + (13j) % 128
#          — support [off_j, off_j + w_j) varies per dimension (width
#          64..191, offset 0..63), so both the mean and the variance of
#          every component differ from the corpus marginals, the way an
#          unaligned second encoder's do.
# Every value stays an integer in [0, 253] with d ≤ 192, so the f32
# exactness contract (knn_join / exact_codes) holds unchanged, and the
# form stays closed-form SQL-recomputable for DuckDB oracle twins.
# No OOD query coincides with a corpus row: equality across all 192
# independently-hashed dimensions has probability ~(1/64)^192 and the
# staged fixtures' tests spot-check it.

_K4 = 3266489917  # xxhash32 prime 4
_K5 = 668265263  # xxhash32 prime 3


def ood_matrix(qids: np.ndarray, d: int = SCALE_D) -> np.ndarray:
    """Closed-form numpy twin of synth_ood_queries — the ground-truth
    stagers and recall pins recompute query vectors through this."""
    qids = np.asarray(qids, dtype=np.int64)
    js = np.arange(d, dtype=np.int64)
    off = (7 * js) % 64
    w = 64 + (13 * js) % 128
    H = (qids[:, None] * _K4) ^ ((js[None, :] + 1) * _K5)
    return (off[None, :] + (H >> 9) % w[None, :]).astype(np.int64)


def synth_ood_queries(
    spark: SparkSession, nq: int = SCALE_NQ, d: int = SCALE_D
) -> DataFrame:
    """(qid, qemb) — the distribution-shifted query batch (see the OOD
    block comment above).  qids 0..nq-1 are query-set ordinals, NOT
    corpus ids; no qtags (the OOD track is unfiltered MIPS)."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            qids = pdf["id"].to_numpy(dtype=np.int64)
            E = ood_matrix(qids, d).astype(np.int32)
            yield pd.DataFrame({"qid": qids, "qemb": list(E)})

    return (
        spark.range(nq)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema="qid BIGINT, qemb ARRAY<INT>")
    )


# ---------------------------------------- yfcc-shaped tag model (r8)
# BASELINE row 1 is yfcc-10M: 10M × 192-d uint8 with a 200,386-tag
# vocabulary whose doc-frequencies are heavy-tailed (`README.md:21-24`;
# the fork's whole mt_threshold hybrid exists BECAUSE query
# selectivities span that range, `filter/faiss/config.yaml:54-63`).
# The modular 30-tag model above (synth_uint8_base) pins every pair at
# selectivity 1/70 — fine for exercising one route, rigged-easy as a
# 10M headline (every query would hit a prebuilt pair view).
#
# This model is dyadic-Zipf and stays closed-form/SQL-recomputable:
# each doc makes _YFCC_DRAWS independent draws; a draw picks a LEVEL
# l uniform in 0.._YFCC_LEVELS-1, then a tag uniform among the 2^l
# tags of that level (tag id = 2^l - 1 + u).  Constant probability
# mass per level over doubling widths ⇒ per-tag doc-frequency ∝ 2^-l
# ∝ 1/rank — Zipf(1) over a (2^18 - 1) = 262,143-tag vocabulary, the
# yfcc scale.  At 10M the hottest tag covers ~2.2M docs (22%) and
# level-17 tags ~17 docs each, so the 1-2-tag query mix spans the
# pair-view / tag-view / metadata-first routing space the reference's
# hybrid was built for.

_YFCC_LEVELS = 18
_YFCC_DRAWS = 4
YFCC_VOCAB = (1 << _YFCC_LEVELS) - 1  # 262,143 tags (yfcc: 200,386)

# Embeddings for the yfcc-shaped corpus are CLUSTERED (center + bounded
# noise), not iid-uniform: real encoder embeddings (yfcc's CLIP vectors,
# msturing) concentrate around modes — that geometry is what makes the
# reference's IVF/HNSW serving work at all.  The first cut reused the
# iid-uniform v2 pattern and measured the textbook consequence at 10M:
# within-tag true neighbors spread across so many Voronoi cells that
# coarse probing never cleared 0.71 recall even at nprobe=32 of 3162 —
# no sublinear method has purchase on structureless uniform data, so a
# uniform corpus would rig the filter-track comparison AGAINST every
# indexed engine (the mirror image of the r7 in-distribution-queries
# flaw).  1,024 centers ≈ 9.8k docs/cluster at 10M; all values stay
# integers ≤ 249 (f32-exact contract) and closed-form SQL-recomputable.
_YFCC_NCL = 1_024


def yfcc_emb_matrix(ids: np.ndarray, d: int = SCALE_D) -> np.ndarray:
    """(n, d) int64 clustered embedding block — the closed-form twin
    DuckDB oracles regenerate: cluster c = (id·K1 >> 7) % 1024,
    center[c,j] = (((c+1)·K4 ^ (j+1)·K5) >> 9) % 192 (inter-cluster
    spread), value = center + ((id·K1 ^ (j+1)·K3) >> 11) % 59
    (intra-cluster noise) ∈ 0..249."""
    ids = np.asarray(ids, dtype=np.int64)
    js = np.arange(d, dtype=np.int64)
    c = ((ids * _K1) >> 7) % _YFCC_NCL
    center = (((c[:, None] + 1) * _K4) ^ ((js[None, :] + 1) * _K5)) >> 9
    noise = ((ids[:, None] * _K1) ^ ((js[None, :] + 1) * _K3)) >> 11
    return center % 192 + noise % 59


def yfcc_draws(ids: np.ndarray, ndraws: int = _YFCC_DRAWS) -> np.ndarray:
    """(n, ndraws) int64 raw tag draws — the closed-form numpy twin the
    DuckDB oracles regenerate: g = (id·K1) XOR ((i+1)·K5),
    l = (g>>5) % 18, tag = (2^l - 1) + ((g>>23) % 2^l).  id·K1 < 2^63
    for id < 2^32, so g stays non-negative and the SQL twin (xor + >>
    + %) is bit-identical."""
    ids = np.asarray(ids, dtype=np.int64)
    di = np.arange(ndraws, dtype=np.int64)
    g = (ids[:, None] * _K1) ^ ((di[None, :] + 1) * _K5)
    lvl = (g >> 5) % _YFCC_LEVELS
    w = np.left_shift(np.int64(1), lvl)
    return w - 1 + ((g >> 23) % w)


def _dedup_rows(T: np.ndarray) -> np.ndarray:
    """Order-preserving per-row distinct mask for a small (n, m) draw
    matrix — keep[i, j] iff T[i, j] differs from every earlier draw of
    row i (m is 4: six vectorized comparisons, no per-row Python)."""
    keep = np.ones(T.shape, dtype=bool)
    for j in range(1, T.shape[1]):
        for i in range(j):
            keep[:, j] &= T[:, j] != T[:, i]
    return keep


def synth_yfcc_base(
    spark: SparkSession, n: int = SCALE_N, d: int = SCALE_D
) -> DataFrame:
    """(id, emb ARRAY<INT> 0..249, tags ARRAY<INT>, sig BIGINT) — the
    clustered yfcc-shaped embedding pattern (yfcc_emb_matrix) under the
    dyadic-Zipf tag model (1-4 distinct tags per doc, draw order
    preserved)."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            E = yfcc_emb_matrix(ids, d).astype(np.int32)
            T = yfcc_draws(ids).astype(np.int32)
            keep = _dedup_rows(T)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "emb": list(E),
                    "tags": [row[m] for row, m in zip(T, keep)],
                }
            )

    base = (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema="id BIGINT, emb ARRAY<INT>, tags ARRAY<INT>")
    )
    return base.withColumn("sig", sig_from_tags(F.col("tags")))


#: query embeddings use the base pattern at id' = 2^24 + qid: the same
#: distribution (the filter track's queries are in-distribution, unlike
#: OOD's), never a corpus row for any n ≤ 2^24
_YFCC_Q_OFFSET = 1 << 24


def synth_yfcc_queries(
    spark: SparkSession,
    nq: int = SCALE_NQ,
    d: int = SCALE_D,
) -> DataFrame:
    """(qid, qemb, qtags) — qemb is the clustered base pattern at
    2^24 + qid (in-distribution, off-corpus — queries land in valid
    corpus clusters without being corpus rows); qtags are the first
    1 + qid % 2 distinct draws of DOC qid (capped at the doc's distinct
    count), so every conjunction matches ≥ 1 corpus doc (doc qid
    itself, for any corpus with n > qid) and the 1-/2-tag mix spans the
    Zipf selectivity range — the yfcc query regime
    (`filter/run.py:10-12`, 1-2 conjunctive tags)."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            qids = pdf["id"].to_numpy(dtype=np.int64)
            E = yfcc_emb_matrix(qids + _YFCC_Q_OFFSET, d).astype(np.int32)
            T = yfcc_draws(qids).astype(np.int32)
            keep = _dedup_rows(T)
            nsel = 1 + (qids % 2)
            yield pd.DataFrame(
                {
                    "qid": qids,
                    "qemb": list(E),
                    "qtags": [
                        row[m][:k] for row, m, k in zip(T, keep, nsel)
                    ],
                }
            )

    return (
        spark.range(nq)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(gen, schema="qid BIGINT, qemb ARRAY<INT>, qtags ARRAY<INT>")
    )


def synth_queries(spark: SparkSession, nq: int = SCALE_NQ, d: int = SCALE_D) -> DataFrame:
    """(qid, qemb, qtags) — the first nq base vectors with the 2-tag
    conjunction [coarse, mid] (selectivity 1/70, the yfcc-style 1-2 tag
    regime).

    Generated through the same partition-parallel kernel as the base
    (a driver-side closed-form pandas + createDataFrame variant measured
    SLOWER: uploading 8k×192 array rows through py4j costs more than the
    mapInPandas generation job).
    """
    q = synth_uint8_base(spark, nq, d)
    return q.select(
        F.col("id").alias("qid"),
        F.col("emb").alias("qemb"),
        F.array(F.col("tags")[0], F.col("tags")[1]).alias("qtags"),
    )
