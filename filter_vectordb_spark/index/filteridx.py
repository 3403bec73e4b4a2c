"""yfcc-scale filtered k-NN serving (BASELINE row 1 at the reference's
own 10M × 192-d × heavy-tailed-vocabulary shape).

Reference architecture (`filter/faiss/faiss.py:238-418`): fit() computes
per-tag doc frequencies (`:238-239`) and prebuilds sub-indexes for every
frequent tag and tag pair (`:254-337`, threshold 0.003); search() routes
per query on estimated selectivity (`mt_threshold`, `:378-385` min-
frequency upper bound): selective queries take metadata-first CSR
intersection + brute force (`:392-399`); the rest search the rarer tag's
sub-index with the other tag checked per node
(`filter/hnsw/hnswalg.h:89,1751-1756` filter_label_set_).

Spark re-expression — four routes, ALL exact (recall 1.0; the reference
trades recall for QPS only because its per-tag indexes are HNSW):

  R1 pair view    both query tags form a prebuilt pair partition →
                  partition-pruned scan of exactly the matching docs
                  (index/tagpart._score_pair_chunk, SQ8-coded, salted).
  R2 tag view     single frequent tag → partition-pruned scan of the
                  tag's docs.
  R3 tag view+mask  two tags, pair unbuilt, rarer tag frequent → scan
                  the rarer tag's partition, mask rows containing the
                  other tag in-kernel (the view carries each doc's full
                  tags array — the filter_label_set_ equivalent).
  R4 metadata-first  rarer tag below min_freq → ONE direct-read pass
                  over the id-sorted codes table: probed-tag inverted
                  hits (vectorized searchsorted over the flattened tags
                  column), per-query posting intersection, grouped GEMM
                  over only the candidates — work ∝ Σ_q |candidates(q)|,
                  the reference's metadata-first cost model batched
                  across the whole query set.

Layout (build_filtered_index):
  stats/    (tag, ndoc)                         A1 routing table
  grid/     SQ8 lossless grid                   shared decode offset
  codes/    (id, codes, tags) id-range files    R4's direct-read source
  tagview/  (tag=<t>/, id, codes, tags)         R2/R3, hot tags salted
  pair/     index/tagpart pair layout           R1

Everything serves 1-byte SQ8 codes (lossless on integer corpora — the
yfcc uint8 regime) and ships only nq×k partials per task into the W3
merge; no route materializes a candidate join.

Contracts: `tags` arrays hold DISTINCT tags per doc (the exploded
views and the R4 hit lists would otherwise duplicate candidates —
every in-tree generator satisfies this).  R4's one-pass sweep is the
right plan while the codes table is page-cache-sized (2.4 GB at 10M);
for a corpus orders of magnitude past RAM, the same selective queries
route through the posting-intersection candidate join instead
(operators/filtered_knn.filtered_knn_metadata_first — work ∝
Σ|postings|, oracle-checked), trading the sweep for a shuffle.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.index.tagpart import _f32_exact_ok, _train_codec
from filter_vectordb_spark.operators.postings import explode_tags
from filter_vectordb_spark.operators.topk import per_group_topk

#: the reference's sub-index build threshold (`filter/faiss/faiss.py:268`)
DEFAULT_MIN_FREQ = 0.003


def _encode_with_tags(base: DataFrame, vmin: np.ndarray, vmax: np.ndarray) -> DataFrame:
    """(id, codes ARRAY<TINYINT>, tags ARRAY<INT>) in one Arrow pass —
    index/sq.encode_sq's transform with the tags column carried through
    (a post-hoc join would shuffle the corpus a second time at build)."""
    from filter_vectordb_spark.index.sq import _scales

    scale = _scales(vmin, vmax)
    lo = vmin.copy()

    def enc(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
            C = np.clip(np.rint((X - lo[None, :]) / scale[None, :]), 0, 255)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(dtype=np.int64),
                    "codes": list((C - 128).astype(np.int8)),
                    "tags": pdf["tags"],
                }
            )

    return base.select("id", "emb", "tags").mapInPandas(
        enc, schema="id long, codes array<tinyint>, tags array<int>"
    )


def index_is_built(out_dir: str) -> bool:
    return os.path.exists(f"{out_dir}/meta.json") and all(
        os.path.exists(f"{out_dir}/{p}/_SUCCESS")
        for p in ("stats", "grid", "codes", "tagview", "pair/view", "centroids")
    )


def build_filtered_index(
    base: DataFrame,
    out_dir: str,
    min_freq: float = DEFAULT_MIN_FREQ,
    pair_min_freq: float = DEFAULT_MIN_FREQ,
    split_rows: int = 262_144,
    nlist: int | None = None,
) -> None:
    """Fit-time build (the reference's fit(), `filter/faiss/faiss.py:
    238-337`; BASELINE QPS excludes build).  base: (id, emb, tags) with
    integer emb admitting the lossless SQ8 grid — the yfcc uint8 regime;
    a float corpus is refused rather than silently served lossy.

    nlist (default √n): a shared coarse quantizer is sample-trained and
    every tag-view row carries its list id, stored LIST-SORTED within
    each (tag, salt) file — the per-tag sub-index the reference builds
    as HNSW (`filter/faiss/faiss.py:254-288`) becomes binary-searchable
    list ranges inside the partition, so an nprobe-gated serve scans
    only each query's nearest lists (filtered_search(nprobe=…))."""
    from filter_vectordb_spark.index.ivf import build_ivf
    from filter_vectordb_spark.index.sq import write_grid
    from filter_vectordb_spark.index.tagpart import build_tag_pair_partitions

    spark = base.sparkSession
    codec = _train_codec(base)
    if codec is None:
        raise ValueError(
            "build_filtered_index requires an integer corpus admitting "
            "the lossless SQ8 grid (the yfcc uint8 regime); float "
            "embeddings would serve lossy codes"
        )
    vmin, vmax = codec
    n = base.count()
    if nlist is None:
        nlist = max(16, int(round(n**0.5)))  # the √N rule
    stats = (
        explode_tags(base).groupBy("tag").agg(F.count("*").alias("ndoc"))
    )
    stats.write.mode("overwrite").parquet(f"{out_dir}/stats")
    write_grid(spark, vmin, vmax, f"{out_dir}/grid")

    coded = _encode_with_tags(base, vmin, vmax)
    # id-range files, id-sorted within: R4 tasks read row-group slices
    # whole; the sorted id column is what makes every view's ids align
    # with deterministic scan order (and keeps parquet RG stats tight)
    coded.repartitionByRange(
        spark.sparkContext.defaultParallelism, "id"
    ).sortWithinPartitions("id").write.mode("overwrite").parquet(f"{out_dir}/codes")

    # shared coarse quantizer (faiss protocol: sample-trained, full
    # assignment — the deterministic driver-side trainer)
    assignments, centroids = build_ivf(
        base.select("id", "emb"),
        nlist=nlist,
        max_iter=10,
        train_rows=min(200_000, n),
        coarse="numpy",
    )
    centroids.write.mode("overwrite").parquet(f"{out_dir}/centroids")

    # frequent-tag view, hot tags salted into ≤split_rows files (the
    # pair build's straggler fix, index/tagpart.py — one writer task AND
    # one scan task per (tag, salt)); rows LIST-SORTED within each file
    sdf = spark.read.parquet(f"{out_dir}/stats")
    frequent = sdf.filter(F.col("ndoc") >= min_freq * n).select("tag", "ndoc")
    view = (
        explode_tags(base)
        .join(F.broadcast(frequent), "tag")
        .join(spark.read.parquet(f"{out_dir}/codes").select("id", "codes", "tags"), "id")
        .join(assignments.select("id", F.col("centroid_id").alias("lst")), "id")
        .select("tag", "id", "codes", "tags", "lst", "ndoc")
    )
    nsplit = F.greatest(F.lit(1), F.ceil(F.col("ndoc") / F.lit(split_rows))).cast("int")
    n_write_tasks = int(
        frequent.agg(
            F.sum(F.greatest(F.lit(1), F.ceil(F.col("ndoc") / F.lit(split_rows)))).alias("s")
        ).first()["s"]
        or 1
    )
    (
        view.withColumn("_salt", F.pmod(F.xxhash64(F.col("id")), nsplit).cast("int"))
        .repartition(n_write_tasks, F.col("tag"), F.col("_salt"))
        # the partition column LEADS the sort: FileFormatWriter re-sorts
        # any task not already ordered by its dynamic partition columns,
        # and that internal sort is not stable — a bare (lst, id) sort
        # here came back scrambled at 10M (measured: probed recall
        # collapsed to the random-scan floor ~nprobe/nlist)
        .sortWithinPartitions("tag", "lst", "id")
        .drop("_salt", "ndoc")
        .write.mode("overwrite")
        .partitionBy("tag")
        .parquet(f"{out_dir}/tagview")
    )

    build_tag_pair_partitions(base, f"{out_dir}/pair", min_freq=pair_min_freq)

    meta = {
        "n_base": int(n),
        "min_freq": min_freq,
        "pair_min_freq": pair_min_freq,
        "nlist": int(nlist),
    }
    tmp = f"{out_dir}/meta.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, f"{out_dir}/meta.json")


#: per-session memo of loaded routing metadata, keyed by (appId, path,
#: meta.json mtime) — same freshness pattern as tagpart._VIEW_CACHE
_ROUTE_CACHE: dict = {}


def _load_routing(spark: SparkSession, out_dir: str):
    """(ndoc dict, n_base, min_freq, decode_off, pair→files dict,
    freq_tag→files dict).  The stats table is vocabulary-bounded (the
    reference's is ~200k tags — a few MB driver-side, the same table
    its fit() keeps in memory, `filter/faiss/faiss.py:238-239`); the
    built pair/tag listings come from the partition directory names —
    driver metadata, no Spark job."""
    from filter_vectordb_spark.index.sq import read_grid

    try:
        token = os.stat(f"{out_dir}/meta.json").st_mtime_ns
    except OSError:
        token = None
    key = (spark.sparkContext.applicationId, out_dir, token)
    hit = _ROUTE_CACHE.get(key)
    if hit is None:
        with open(f"{out_dir}/meta.json") as fh:
            meta = json.load(fh)
        pdf = spark.read.parquet(f"{out_dir}/stats").toPandas()
        ndoc = dict(zip(pdf["tag"].astype(int), pdf["ndoc"].astype(int)))
        vmin, _vmax = read_grid(spark, f"{out_dir}/grid")
        off = vmin + 128.0
        pair_files: dict[tuple[int, int], list[str]] = {}
        for d in _glob.glob(f"{out_dir}/pair/view/tag_a=*/tag_b=*"):
            b = int(os.path.basename(d).split("=", 1)[1])
            a = int(os.path.basename(os.path.dirname(d)).split("=", 1)[1])
            pair_files[(a, b)] = sorted(_glob.glob(f"{d}/*.parquet"))
        tag_files = {}
        for d in _glob.glob(f"{out_dir}/tagview/tag=*"):
            t = int(os.path.basename(d).split("=", 1)[1])
            tag_files[t] = sorted(_glob.glob(f"{d}/*.parquet"))
        cpdf = (
            spark.read.parquet(f"{out_dir}/centroids")
            .toPandas()
            .sort_values("centroid_id")
        )
        C = np.stack(cpdf["centroid"].to_numpy()).astype(np.float64)
        for stale in [k for k in _ROUTE_CACHE if k[1] == out_dir]:
            del _ROUTE_CACHE[stale]
        hit = (
            ndoc,
            int(meta["n_base"]),
            float(meta["min_freq"]),
            off,
            pair_files,
            tag_files,
            C,
        )
        _ROUTE_CACHE[key] = hit
    return hit


def _score_pairview(
    spark: SparkSession,
    pair_files: dict,
    qpdf,
    k: int,
    off: np.ndarray,
) -> DataFrame:
    """R1, direct-read: qpdf(qid, qemb, tag_a, tag_b).  Only the PROBED
    pairs' partition files are opened (driver-side dict lookup — the
    partition-pruning the DataFrame route left to runtime DPP, which
    measured a full 531 MB view read + JVM Arrow hop per batch at the
    10M point); per pair group one GEMM per task unit."""
    groups: dict = {}
    for (a, b), grp in qpdf.groupby(["tag_a", "tag_b"]):
        groups[(int(a), int(b))] = (
            grp["qid"].to_numpy(dtype=np.int64),
            np.stack(grp["qemb"].to_numpy()).astype(np.float64),
        )
    use_f32 = _f32_exact_ok(np.stack(qpdf["qemb"].to_numpy()).astype(np.float64))
    units = []
    for pr in groups:
        files = pair_files.get(pr, ())
        if files:
            units.extend(
                (pr[0], pr[1], p, lo, hi)
                for _pl, p, lo, hi in _rg_units(spark, list(files))
            )
    if not units:
        return spark.createDataFrame([], "qid LONG, id LONG, dist DOUBLE")
    bc = spark.sparkContext.broadcast((groups, off, use_f32))
    par = max(1, min(len(units), 4 * spark.sparkContext.defaultParallelism))
    fdf = spark.createDataFrame(
        spark.sparkContext.parallelize(units, par),
        "tag_a INT, tag_b INT, path STRING, rg_lo INT, rg_hi INT",
    )

    def serve(it):
        import pyarrow.parquet as pq

        from filter_vectordb_spark.operators.knn import gemm_topk, task_topk_merge

        bgroups, boff, bf32 = bc.value
        out_q, out_i, out_d = [], [], []
        for batch in it:
            for a, b, path, lo, hi in zip(
                batch.column("tag_a").to_pylist(),
                batch.column("tag_b").to_pylist(),
                batch.column("path").to_pylist(),
                batch.column("rg_lo").to_pylist(),
                batch.column("rg_hi").to_pylist(),
            ):
                qg = bgroups.get((a, b))
                if qg is None:
                    continue
                qids, Q = qg
                tbl = pq.ParquetFile(path).read_row_groups(
                    list(range(lo, hi)), columns=["id", "codes"]
                )
                n = tbl.num_rows
                if n == 0:
                    continue
                ids = tbl.column("id").to_numpy(zero_copy_only=False)
                X = _decode(tbl.column("codes"), None, n, boff, bf32)
                xn = _sqnorms(X)
                Qc = Q.astype(np.float32) if X.dtype == np.float32 else Q
                qn = (Q * Q).sum(axis=1)
                part, dist = gemm_topk(Qc, qn, X, xn, "l2", k)
                out_q.append(np.repeat(qids, part.shape[1]))
                out_i.append(ids[part].ravel())
                out_d.append(dist.ravel())
        if out_q:
            yield task_topk_merge(
                np.concatenate(out_q),
                np.concatenate(out_i),
                np.concatenate(out_d),
                k,
                largest=False,
            )

    return fdf.mapInArrow(serve, schema="qid long, id long, dist double")


#: (path, mtime_ns, size) → num_row_groups — staged index files are
#: immutable once written; per-batch footer re-reads measured ~0.4 s of
#: pure driver overhead on the serving path
_RG_CACHE: dict = {}


def _num_row_groups(path: str) -> int:
    import pyarrow.parquet as pq

    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    n = _RG_CACHE.get(key)
    if n is None:
        if len(_RG_CACHE) >= 4096:
            _RG_CACHE.clear()
        n = pq.ParquetFile(path).num_row_groups
        _RG_CACHE[key] = n
    return n


def _rg_units(spark: SparkSession, files: list[str], payload=None) -> list:
    """(payload, path, rg_lo, rg_hi) task units, row-group-aligned, ~4×
    parallelism when row groups abound (the direct-read fan-out shape of
    operators/knn._score_vectorized_chunk_direct)."""
    rg_counts = [(p, _num_row_groups(p)) for p in files]
    total_rg = sum(n for _, n in rg_counts)
    target = 4 * spark.sparkContext.defaultParallelism
    step = max(1, total_rg // max(1, target))
    units = []
    for p, nrg in rg_counts:
        for lo in range(0, nrg, step):
            units.append((payload, p, lo, min(lo + step, nrg)))
    return units


def _flat_tags(tbl_col, n: int):
    """(flat_tags int64, row_of int64) off the Arrow list buffers —
    rebased for sliced arrays (the tagpart/filtered_knn convention)."""
    import pyarrow as pa

    col = tbl_col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = (col.values.to_numpy(zero_copy_only=False).astype(np.int64))[
        off[0] : off[-1]
    ]
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    return flat, row_of


def _codes_matrix(col, n: int) -> np.ndarray:
    """(n, d) int8 matrix over an Arrow fixed-length list column —
    ZERO-COPY view when the buffers admit it (int8 values, no nulls:
    the SQ8 code layout always does), else the copying flatten.  The
    probed route's per-unit flatten copy (~47 MB/unit × every unit ×
    every batch) was its dominant fixed cost — a view makes unprobed
    rows genuinely free."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        offs = col.offsets.to_numpy(zero_copy_only=True)
        flat = col.values.to_numpy(zero_copy_only=True)
    except (pa.ArrowInvalid, ValueError):
        from filter_vectordb_spark.operators.knn import flatten_fixed_list

        return flatten_fixed_list(col, n)
    flat = flat[offs[0] : offs[-1]]
    d, rem = divmod(flat.size, max(1, n))
    if rem:
        raise ValueError("ragged codes column — fixed-length vectors required")
    return flat.reshape(n, d)


#: per-worker decode scratch, keyed by dtype — Python workers persist
#: across tasks, so reusing one buffer avoids a fresh ~250 MB mmap +
#: first-touch page-fault storm per unit (measured 2.5 s/unit on this
#: host's THP-compacting kernel vs ~0.3 s into warm pages).  The buffer
#: is only valid until the NEXT _decode call on the same worker; every
#: caller finishes with a unit's block before decoding the next.
_DECODE_SCRATCH: dict = {}


def _decode(codes_col, rows: np.ndarray | None, n: int, off: np.ndarray, f32: bool):
    """Selected rows of the int8 code block, decoded to original values
    (lossless grid): x = code + off — ONE fused pass (int8 + f32
    broadcasts straight to f32) into the reused scratch."""
    C = _codes_matrix(codes_col, n)
    if rows is not None:
        C = C[rows]
    dt = np.float32 if f32 else np.float64
    need = C.shape[0] * C.shape[1]
    buf = _DECODE_SCRATCH.get(dt)
    if buf is None or buf.size < need:
        buf = np.empty(max(need, 1), dtype=dt)
        _DECODE_SCRATCH[dt] = buf
    X = buf[:need].reshape(C.shape)
    np.add(C, off.astype(dt)[None, :], out=X)
    return X


def _sqnorms(X: np.ndarray) -> np.ndarray:
    """Per-row squared norms as float64.  On the f32 integer-exact path
    the products and every partial sum stay below 2²⁴, so one f32
    einsum is BIT-exact — the per-group float64 matrix conversion it
    replaces was the meta/tag kernels' single largest memory-traffic
    term (192 × 8 B per candidate row)."""
    if X.dtype == np.float32:
        return np.einsum("ij,ij->i", X, X).astype(np.float64)
    return np.einsum("ij,ij->i", X, X)


def _score_tagview(
    spark: SparkSession,
    tag_files: dict[int, list[str]],
    qpdf,
    k: int,
    off: np.ndarray,
) -> DataFrame:
    """R2/R3: qpdf(qid, qemb, tag, other) with other = -1 for no mask.
    Direct-read over ONLY the probed tags' partition files; per (tag,
    other) query group, one mask (when other ≥ 0) + one GEMM per task
    unit; nq×k partials per task (W3)."""
    groups: dict = {}
    for (tag, other), grp in qpdf.groupby(["tag", "other"]):
        groups.setdefault(int(tag), []).append(
            (
                int(other),
                grp["qid"].to_numpy(dtype=np.int64),
                np.stack(grp["qemb"].to_numpy()).astype(np.float64),
            )
        )
    use_f32 = _f32_exact_ok(np.stack(qpdf["qemb"].to_numpy()).astype(np.float64))
    files = []
    for t in groups:
        for p in tag_files.get(t, ()):
            files.append((t, p))
    if not files:
        return spark.createDataFrame([], "qid LONG, id LONG, dist DOUBLE")
    units = []
    for t, p in files:
        units.extend(_rg_units(spark, [p], payload=t))
    bc = spark.sparkContext.broadcast((groups, off, use_f32))
    par = max(1, min(len(units), 4 * spark.sparkContext.defaultParallelism))
    fdf = spark.createDataFrame(
        spark.sparkContext.parallelize(units, par),
        "tag INT, path STRING, rg_lo INT, rg_hi INT",
    )

    def serve(it):
        import pyarrow.parquet as pq

        from filter_vectordb_spark.operators.knn import gemm_topk, task_topk_merge

        bgroups, boff, bf32 = bc.value
        out_q, out_i, out_d = [], [], []
        for batch in it:
            for tag, path, lo, hi in zip(
                batch.column("tag").to_pylist(),
                batch.column("path").to_pylist(),
                batch.column("rg_lo").to_pylist(),
                batch.column("rg_hi").to_pylist(),
            ):
                tgroups = bgroups.get(tag)
                if not tgroups:
                    continue
                others = np.array(
                    sorted({o for o, _, _ in tgroups if o >= 0}), dtype=np.int64
                )
                cols = ["id", "codes"] + (["tags"] if len(others) else [])
                tbl = pq.ParquetFile(path).read_row_groups(
                    list(range(lo, hi)), columns=cols
                )
                n = tbl.num_rows
                if n == 0:
                    continue
                ids = tbl.column("id").to_numpy(zero_copy_only=False)
                starts = prow = None
                if len(others):
                    # every unit row already carries THIS tag, so the
                    # conjunction candidates of a (tag, other) group are
                    # exactly `other`'s posting list within the unit
                    flat, row_of = _flat_tags(tbl.column("tags"), n)
                    _pt, prow, starts = _hit_lists(
                        flat, row_of, others, _probed_lut(others)
                    )
                X_all = _decode(tbl.column("codes"), None, n, boff, bf32)
                xn_all = _sqnorms(X_all)  # once per unit (f32-exact)
                # masked 2-tag groups: flat (query, row) pairs, scored in
                # one chunked integer-exact einsum (the per-group slice +
                # BLAS-call loop ran |others| × units times)
                pq_, pr = [], []
                for other, qids, Q in tgroups:
                    if other < 0:
                        # single-tag group: the whole unit, GEMM-shaped
                        Qc = (
                            Q.astype(np.float32)
                            if X_all.dtype == np.float32
                            else Q
                        )
                        qn = (Q * Q).sum(axis=1)
                        part, dist = gemm_topk(Qc, qn, X_all, xn_all, "l2", k)
                        out_q.append(np.repeat(qids, part.shape[1]))
                        out_i.append(ids[part].ravel())
                        out_d.append(dist.ravel())
                        continue
                    oi = int(np.searchsorted(others, other))
                    rows = prow[starts[oi] : starts[oi + 1]]
                    if len(rows) == 0:
                        continue
                    m = len(qids)
                    nb = sum(g[2].shape[0] for g in pq_)  # query-row base
                    pq_.append(
                        (
                            np.repeat(qids, len(rows)),
                            nb + np.repeat(np.arange(m, dtype=np.int64), len(rows)),
                            Q,
                            np.tile(rows, m),
                        )
                    )
                if pq_:
                    QU = np.concatenate([g[2] for g in pq_], axis=0)
                    qidx = np.concatenate([g[1] for g in pq_])
                    qid_cat = np.concatenate([g[0] for g in pq_])
                    rows_cat = np.concatenate([g[3] for g in pq_])
                    qn_u = (QU * QU).sum(axis=1)
                    Qm = QU.astype(np.float32) if X_all.dtype == np.float32 else QU
                    g = np.empty(len(rows_cat), dtype=np.float64)
                    for clo in range(0, len(rows_cat), _PAIR_CHUNK):
                        chi = min(clo + _PAIR_CHUNK, len(rows_cat))
                        g[clo:chi] = np.einsum(
                            "ij,ij->i",
                            Qm[qidx[clo:chi]],
                            X_all[rows_cat[clo:chi]],
                        ).astype(np.float64)
                    dist = qn_u[qidx] - 2.0 * g + xn_all[rows_cat]
                    np.maximum(dist, 0.0, out=dist)
                    out_q.append(qid_cat)
                    out_i.append(ids[rows_cat])
                    out_d.append(dist)
        if out_q:
            yield task_topk_merge(
                np.concatenate(out_q),
                np.concatenate(out_i),
                np.concatenate(out_d),
                k,
                largest=False,
            )

    return fdf.mapInArrow(serve, schema="qid long, id long, dist double")


def _score_tagview_probed(
    spark: SparkSession,
    tag_files: dict[int, list[str]],
    qpdf,
    k: int,
    off: np.ndarray,
    probes: np.ndarray,
    nlist: int,
) -> DataFrame:
    """R2/R3 with the per-tag sub-index ACTUALLY pruning: each query
    scans only its `probes` row's coarse lists inside the routed tag's
    partition — the lst-sorted file layout turns a probe set into
    binary-searched row ranges, the faiss IVF shape within each tag
    (the reference's per-tag sub-indexes are approximate HNSW;
    `filter/faiss/config.yaml:41-64`'s published 3,200 QPS is at the
    0.9-recall gate, so this is the like-for-like operating mode).
    Scanned rows are scored EXACTLY (decoded lossless codes, f64
    distance assembly) — recall loss comes only from unprobed lists;
    nprobe ≥ nlist reproduces the exact route bit-for-bit (pytest-
    pinned)."""
    groups: dict = {}
    pos_of = {j: i for i, j in enumerate(qpdf.index)}
    for (tag, other), grp in qpdf.groupby(["tag", "other"]):
        rows = np.array([pos_of[j] for j in grp.index], dtype=np.int64)
        groups.setdefault(int(tag), []).append(
            (
                int(other),
                grp["qid"].to_numpy(dtype=np.int64),
                np.stack(grp["qemb"].to_numpy()).astype(np.float64),
                probes[rows],
            )
        )
    use_f32 = _f32_exact_ok(np.stack(qpdf["qemb"].to_numpy()).astype(np.float64))
    units = []
    for t in groups:
        for p in tag_files.get(t, ()):
            units.extend(
                (t, pth, lo, hi) for _pl, pth, lo, hi in _rg_units(spark, [p])
            )
    if not units:
        return spark.createDataFrame([], "qid LONG, id LONG, dist DOUBLE")
    bc = spark.sparkContext.broadcast((groups, off, use_f32, nlist))
    par = max(1, min(len(units), 4 * spark.sparkContext.defaultParallelism))
    fdf = spark.createDataFrame(
        spark.sparkContext.parallelize(units, par),
        "tag INT, path STRING, rg_lo INT, rg_hi INT",
    )

    def serve(it):
        import pyarrow.parquet as pq

        from filter_vectordb_spark.operators.knn import task_topk_merge

        bgroups, boff, bf32, bnlist = bc.value
        off32 = boff.astype(np.float32)
        out_q, out_i, out_d = [], [], []
        for batch in it:
            for tag, path, lo, hi in zip(
                batch.column("tag").to_pylist(),
                batch.column("path").to_pylist(),
                batch.column("rg_lo").to_pylist(),
                batch.column("rg_hi").to_pylist(),
            ):
                tgroups = bgroups.get(tag)
                if not tgroups:
                    continue
                need_tags = any(o >= 0 for o, _, _, _ in tgroups)
                cols = ["id", "codes", "lst"] + (["tags"] if need_tags else [])
                tbl = pq.ParquetFile(path).read_row_groups(
                    list(range(lo, hi)), columns=cols
                )
                n = tbl.num_rows
                if n == 0:
                    continue
                ids = tbl.column("id").to_numpy(zero_copy_only=False)
                lst = tbl.column("lst").to_numpy(zero_copy_only=False)
                C8 = _codes_matrix(tbl.column("codes"), n)
                other_masks: dict[int, np.ndarray] = {}
                flat = row_of = None
                if need_tags:
                    flat, row_of = _flat_tags(tbl.column("tags"), n)
                # lst ascending within each file by the build's
                # (tag, lst, id) sortWithinPartitions — probe sets become
                # binary-searched row ranges.  GUARD, not assumption: a
                # writer that re-sorts by partition columns (older
                # layouts, foreign builds) hands back scrambled rows —
                # re-sort locally instead of silently scanning the wrong
                # lists (that failure measured recall ≈ nprobe/nlist)
                if np.any(np.diff(lst) < 0):
                    order = np.argsort(lst, kind="stable")
                    ids, lst = ids[order], lst[order]
                    C8 = np.ascontiguousarray(C8[order])
                    if row_of is not None:
                        inv = np.empty(n, dtype=np.int64)
                        inv[order] = np.arange(n, dtype=np.int64)
                        row_of = inv[row_of]
                bounds = np.searchsorted(
                    lst, np.arange(bnlist + 1, dtype=np.int64)
                )
                for other, qids, Q, P in tgroups:
                    om = None
                    if other >= 0:
                        om = other_masks.get(other)
                        if om is None:
                            # row_of is already remapped if the unit was
                            # locally re-sorted above
                            om = np.zeros(n, dtype=bool)
                            om[row_of[flat == other]] = True
                            other_masks[other] = om
                    # every query's probed row ranges IN ONE SHOT (the
                    # per-query range-concatenate loop ran len(qids) ×
                    # units times — its Python overhead, not the math,
                    # dominated hot-tag groups): one multi-slice gather
                    # over the (query, probe) range matrix
                    plo = bounds[P]  # (m, nprobe) range starts
                    cnt = bounds[P + 1] - plo
                    ccnt = cnt.ravel()
                    tot = int(ccnt.sum())
                    if tot == 0:
                        continue
                    ofs = np.zeros(len(ccnt), dtype=np.int64)
                    np.cumsum(ccnt[:-1], out=ofs[1:])
                    rows = (
                        np.arange(tot, dtype=np.int64)
                        - np.repeat(ofs, ccnt)
                        + np.repeat(plo.ravel(), ccnt)
                    )
                    qrep = np.repeat(
                        np.arange(len(qids), dtype=np.int64), cnt.sum(axis=1)
                    )
                    if om is not None:
                        keep = om[rows]
                        rows, qrep = rows[keep], qrep[keep]
                        if len(rows) == 0:
                            continue
                    # decode only the UNION of probed rows (the probed
                    # route's point is never touching unprobed codes)
                    ur, pos = np.unique(rows, return_inverse=True)
                    if bf32:  # integer-exact f32 (knn_join contract)
                        Xu = C8[ur].astype(np.float32) + off32[None, :]
                        Qm = Q.astype(np.float32)
                    else:
                        Xu = C8[ur].astype(np.float64) + boff[None, :]
                        Qm = Q
                    xn_u = _sqnorms(Xu)
                    qn = (Q * Q).sum(axis=1)
                    g = np.empty(len(rows), dtype=np.float64)
                    for clo in range(0, len(rows), _PAIR_CHUNK):
                        chi = min(clo + _PAIR_CHUNK, len(rows))
                        g[clo:chi] = np.einsum(
                            "ij,ij->i", Qm[qrep[clo:chi]], Xu[pos[clo:chi]]
                        ).astype(np.float64)
                    dist = qn[qrep] - 2.0 * g + xn_u[pos]
                    np.maximum(dist, 0.0, out=dist)
                    out_q.append(qids[qrep])
                    out_i.append(ids[rows])
                    out_d.append(dist)
        if out_q:
            yield task_topk_merge(
                np.concatenate(out_q),
                np.concatenate(out_i),
                np.concatenate(out_d),
                k,
                largest=False,
            )

    return fdf.mapInArrow(serve, schema="qid long, id long, dist double")


#: pair-scoring chunk: per-chunk gather buffers are 2 × CH × d × 4 B
#: (≈ 50 MB at d=192) — bounded however many candidate pairs a unit has
_PAIR_CHUNK = 65_536

#: build the probed-tag lookup table only while it stays broadcast-small
#: (int32 LUT over 0..max_tag — 262k-tag yfcc vocab ≈ 1 MB); a sparse /
#: huge / negative tag space falls back to binary search
_LUT_MAX_TAG = 8_000_000


def _probed_lut(probed: np.ndarray) -> np.ndarray | None:
    if len(probed) == 0 or probed[0] < 0 or probed[-1] > _LUT_MAX_TAG:
        return None
    lut = np.full(int(probed[-1]) + 1, -1, dtype=np.int32)
    lut[probed] = np.arange(len(probed), dtype=np.int32)
    return lut


def _hit_lists(flat, row_of, probed, lut):
    """(ptag, prow, starts): probed-tag posting lists within a unit —
    rows carrying probed tag probed[i] are prow[starts[i]:starts[i+1]],
    row-ascending.  Membership via the O(1) LUT gather when the tag
    space admits it, else one searchsorted sweep."""
    if lut is not None:
        safe = np.minimum(flat, len(lut) - 1)
        pidx = lut[safe]
        valid = (pidx >= 0) & (flat == safe) & (flat >= 0)
        ptag = pidx[valid].astype(np.int64)
    else:
        pos = np.searchsorted(probed, flat)
        valid = pos < len(probed)
        valid[valid] = probed[pos[valid]] == flat[valid]
        ptag = pos[valid]
    prow = row_of[valid]
    order = np.lexsort((prow, ptag))
    ptag, prow = ptag[order], prow[order]
    starts = np.searchsorted(ptag, np.arange(len(probed) + 1, dtype=np.int64))
    return ptag, prow, starts


def _score_meta(
    spark: SparkSession,
    codes_dir: str,
    qpdf,
    k: int,
    off: np.ndarray,
    ndoc: dict | None = None,
) -> DataFrame:
    """R4: one direct-read pass over the codes table for ALL selective
    queries.  qpdf(qid, qemb, qtags).  Per task unit: flatten the tags
    column once, one vectorized LUT membership pass against the probed
    tags, lexsort the hits into per-tag posting lists, then build every
    query's candidate (query, row) pairs IN ONE SHOT — a multi-slice
    gather over each query's rarer-tag posting range, with the second
    conjunct verified by one searchsorted over combined (tag, row) keys
    — and score all pairs with a chunked integer-exact f32 einsum.
    Work ∝ Σ_q |postings(rarer tag of q)| plus one metadata sweep; no
    per-query Python loop (the prior per-conjunction-group loop ran
    ~6k groups × ~128 units per 8k-query batch — its slice + BLAS-call
    overhead, not the math, dominated the 10M row), and never a
    candidate join shuffle.

    ndoc (the routing stats) picks each 2-tag query's RARER conjunct so
    the gather touches the smaller posting list — the reference's
    min-frequency cost model (`filter/faiss/faiss.py:378-385`).
    Conjunctions beyond 2 tags take a per-group sorted-intersection
    path; an empty conjunction scans the unit via the blocked GEMM."""
    qids_all = qpdf["qid"].to_numpy(dtype=np.int64)
    Q_all = np.stack(qpdf["qemb"].to_numpy()).astype(np.float64)
    needs = [
        sorted({int(x) for x in (t if t is not None else ())})
        for t in qpdf["qtags"]
    ]
    probed = np.array(sorted({t for need in needs for t in need}), dtype=np.int64)
    pidx_of = {int(t): i for i, t in enumerate(probed)}
    scan_pos: list[int] = []  # empty conjunction → full scan
    flat_pos: list[int] = []  # 1-2 tags → the vectorized pair kernel
    flat_rarer: list[int] = []
    flat_other: list[int] = []
    multi: list[tuple] = []  # >2 tags → per-group sorted intersection
    for j, need in enumerate(needs):
        if not need:
            scan_pos.append(j)
        elif len(need) <= 2:
            rarer = min(need, key=lambda t: (ndoc or {}).get(t, 0))
            rest = [t for t in need if t != rarer]
            flat_pos.append(j)
            flat_rarer.append(pidx_of[rarer])
            flat_other.append(pidx_of[rest[0]] if rest else -1)
        else:
            idx = np.array([pidx_of[t] for t in need], dtype=np.int64)
            multi.append((idx, j))
    scan_q = (qids_all[scan_pos], Q_all[scan_pos]) if scan_pos else None
    fp = np.asarray(flat_pos, dtype=np.int64)
    flat_q = (
        qids_all[fp],
        Q_all[fp],
        np.asarray(flat_rarer, dtype=np.int64),
        np.asarray(flat_other, dtype=np.int64),
    )
    multi_q = [(idx, qids_all[j : j + 1], Q_all[j : j + 1]) for idx, j in multi]
    use_f32 = _f32_exact_ok(Q_all)
    lut = _probed_lut(probed)
    files = sorted(_glob.glob(f"{codes_dir}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {codes_dir}")
    units = _rg_units(spark, files, payload=0)
    bc = spark.sparkContext.broadcast(
        (scan_q, flat_q, multi_q, probed, lut, off, use_f32)
    )
    par = max(1, min(len(units), 4 * spark.sparkContext.defaultParallelism))
    fdf = spark.createDataFrame(
        spark.sparkContext.parallelize(units, par),
        "pl INT, path STRING, rg_lo INT, rg_hi INT",
    )

    def serve(it):
        import pyarrow.parquet as pq

        from filter_vectordb_spark.operators.knn import gemm_topk, task_topk_merge

        bscan, bflat, bmulti, bprobed, blut, boff, bf32 = bc.value
        fqids, fQ, frarer, fother = bflat
        fQ32 = fQ.astype(np.float32)
        fqn = (fQ * fQ).sum(axis=1)
        out_q, out_i, out_d = [], [], []
        for batch in it:
            for path, lo, hi in zip(
                batch.column("path").to_pylist(),
                batch.column("rg_lo").to_pylist(),
                batch.column("rg_hi").to_pylist(),
            ):
                tbl = pq.ParquetFile(path).read_row_groups(
                    list(range(lo, hi)), columns=["id", "codes", "tags"]
                )
                n = tbl.num_rows
                if n == 0:
                    continue
                ids = tbl.column("id").to_numpy(zero_copy_only=False)
                flat, row_of = _flat_tags(tbl.column("tags"), n)
                ptag, prow, starts = _hit_lists(flat, row_of, bprobed, blut)
                X_all = xn_all = None

                def unit_arrays():
                    nonlocal X_all, xn_all
                    if X_all is None:
                        X_all = _decode(tbl.column("codes"), None, n, boff, bf32)
                        xn_all = _sqnorms(X_all)  # once per unit (f32-exact)
                    return X_all, xn_all

                # ---- the 1-2-tag bulk: all candidate pairs in one shot
                if len(fqids):
                    cnt = starts[frarer + 1] - starts[frarer]
                    tot = int(cnt.sum())
                else:
                    tot = 0
                if tot:
                    qrep = np.repeat(np.arange(len(fqids), dtype=np.int64), cnt)
                    ofs = np.zeros(len(cnt), dtype=np.int64)
                    np.cumsum(cnt[:-1], out=ofs[1:])
                    idx = (
                        np.arange(tot, dtype=np.int64)
                        - np.repeat(ofs, cnt)
                        + np.repeat(starts[frarer], cnt)
                    )
                    rows = prow[idx]
                    ho = fother[qrep]
                    m2 = ho >= 0
                    if m2.any():
                        # (ptag, prow) is lexsorted and per-doc tags are
                        # distinct → combined keys are strictly ascending
                        keys = ptag * n + prow
                        want = ho[m2] * n + rows[m2]
                        p2 = np.searchsorted(keys, want)
                        ok = p2 < len(keys)
                        ok[ok] = keys[p2[ok]] == want[ok]
                        keep = np.ones(tot, dtype=bool)
                        keep[np.flatnonzero(m2)[~ok]] = False
                        qrep, rows = qrep[keep], rows[keep]
                if tot and len(qrep):
                    X, xn = unit_arrays()
                    Qm = fQ32 if X.dtype == np.float32 else fQ
                    np_d = np.empty(len(qrep), dtype=np.float64)
                    for plo in range(0, len(qrep), _PAIR_CHUNK):
                        phi = min(plo + _PAIR_CHUNK, len(qrep))
                        a = Qm[qrep[plo:phi]]
                        b = X[rows[plo:phi]]
                        g = np.einsum("ij,ij->i", a, b)
                        np_d[plo:phi] = g.astype(np.float64)
                    dist = fqn[qrep] - 2.0 * np_d + xn[rows]
                    np.maximum(dist, 0.0, out=dist)
                    out_q.append(fqids[qrep])
                    out_i.append(ids[rows])
                    out_d.append(dist)

                # ---- >2-tag conjunctions: per-group sorted intersection
                for need_idx, qids, Q in bmulti:
                    rows = prow[starts[need_idx[0]] : starts[need_idx[0] + 1]]
                    for t in need_idx[1:]:
                        other = prow[starts[t] : starts[t + 1]]
                        p2 = np.searchsorted(other, rows)
                        m = p2 < len(other)
                        m[m] = other[p2[m]] == rows[m]
                        rows = rows[m]
                    if len(rows) == 0:
                        continue
                    X, xn = unit_arrays()
                    Xc = np.ascontiguousarray(X[rows])
                    Qc = Q.astype(np.float32) if Xc.dtype == np.float32 else Q
                    qn = (Q * Q).sum(axis=1)
                    part, dist = gemm_topk(Qc, qn, Xc, xn[rows], "l2", k)
                    out_q.append(np.repeat(qids, part.shape[1]))
                    out_i.append(ids[rows][part].ravel())
                    out_d.append(dist.ravel())

                # ---- empty conjunction: every row, blocked GEMM
                if bscan is not None:
                    qids, Q = bscan
                    X, xn = unit_arrays()
                    Qc = Q.astype(np.float32) if X.dtype == np.float32 else Q
                    qn = (Q * Q).sum(axis=1)
                    part, dist = gemm_topk(Qc, qn, X, xn, "l2", k)
                    out_q.append(np.repeat(qids, part.shape[1]))
                    out_i.append(ids[part].ravel())
                    out_d.append(dist.ravel())
        if out_q:
            yield task_topk_merge(
                np.concatenate(out_q),
                np.concatenate(out_i),
                np.concatenate(out_d),
                k,
                largest=False,
            )

    return fdf.mapInArrow(serve, schema="qid long, id long, dist double")


def _route(qtags_col, ndoc: dict, thr: float, pairs: set, tag_files: dict):
    """Per-query route decision — the reference's min-frequency rule
    (`filter/faiss/faiss.py:378-385`) plus its prebuilt-sub-index
    preference (`:404-418`).  Returns (r_pair, r_tag, r_meta row-index
    lists, tag_col, other_col).  Pure driver-side; unit-tested."""
    n = len(qtags_col)
    r_pair, r_tag, r_meta = [], [], []
    tag_col = np.full(n, -1, dtype=np.int64)
    other_col = np.full(n, -1, dtype=np.int64)
    for j, t in enumerate(qtags_col):
        need = sorted({int(x) for x in (t if t is not None else ())})
        if len(need) == 2 and (need[0], need[1]) in pairs:
            r_pair.append(j)
            continue
        freqs = [(ndoc.get(x, 0), x) for x in need]
        if not freqs or min(f for f, _ in freqs) < thr:
            r_meta.append(j)  # incl. the empty conjunction (scan-all)
            continue
        _, rarer = min(freqs)
        if rarer in tag_files:
            tag_col[j] = rarer
            rest = [x for x in need if x != rarer]
            other_col[j] = rest[0] if rest else -1
            r_tag.append(j)
        else:
            # frequent by count but no partition (stale build) — exact
            # fallback through the metadata scan
            r_meta.append(j)
    return r_pair, r_tag, r_meta, tag_col, other_col


def filtered_search(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int | None = None,
) -> DataFrame:
    """Serve a query batch through the built index.  queries: (qid,
    qemb, qtags ARRAY<INT>, 0-2 tags).  Returns (qid, id, dist, rank);
    a query whose conjunction matches no doc is absent (the harness's
    -1 padding is W2's job).  Routing is the reference's min-frequency
    rule (`filter/faiss/faiss.py:378-385`): rarer-tag ndoc < min_freq·n
    → metadata-first; else the prebuilt pair/tag partitions.

    nprobe: None serves the tag-view routes EXACTLY (full partition
    scan — recall 1.0 everywhere).  An integer serves them through the
    per-tag IVF layout (each query scans only its nprobe nearest coarse
    lists — the reference's per-tag sub-indexes are likewise
    approximate, its 3,200 QPS is AT the 0.9-recall gate); the pair
    and metadata-first routes stay exact either way, mirroring the
    reference's hybrid (selective queries are exact brute force there
    too, `filter/faiss/faiss.py:392-399`).  nprobe ≥ nlist reproduces
    the exact result bit-for-bit."""
    import filter_vectordb_spark.operators.knn as _knn

    (ndoc, n_base, min_freq, off, pair_files, tag_files, C) = _load_routing(
        spark, out_dir
    )
    qpdf = queries.select("qid", "qemb", "qtags").limit(
        _knn.MAX_BROADCAST_QUERIES
    ).toPandas()
    if len(qpdf) >= _knn.MAX_BROADCAST_QUERIES:
        raise ValueError(
            "filtered_search serves broadcast-sized query batches "
            f"(< {_knn.MAX_BROADCAST_QUERIES}); chunk the batch upstream"
        )
    if len(qpdf) == 0:
        return spark.createDataFrame([], "qid LONG, id LONG, dist DOUBLE, rank INT")
    r_pair, r_tag, r_meta, tag_col, other_col = _route(
        qpdf["qtags"], ndoc, min_freq * n_base, pair_files, tag_files
    )
    parts = []
    if r_pair:
        pp = qpdf.iloc[r_pair].copy()
        tt = np.array([sorted({int(x) for x in t}) for t in pp["qtags"]])
        pp["tag_a"], pp["tag_b"] = tt[:, 0], tt[:, 1]
        parts.append(_score_pairview(spark, pair_files, pp, k, off))
    if r_tag:
        tp = qpdf.iloc[r_tag].copy()
        tp["tag"] = tag_col[r_tag]
        tp["other"] = other_col[r_tag]
        if nprobe is None or nprobe >= len(C):
            parts.append(_score_tagview(spark, tag_files, tp, k, off))
        else:
            from filter_vectordb_spark.index.ivfsq import driver_blas

            # per-query probe lists: rank the shared coarse centroids by
            # L2 — a bounded nq×nlist block, driver-side with borrowed
            # BLAS cores (restored on exit)
            Q = np.stack(tp["qemb"].to_numpy()).astype(np.float64)
            with driver_blas(os.cpu_count() or 8):
                d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Q @ C.T)
            P = np.argpartition(d2, nprobe - 1, axis=1)[:, :nprobe].astype(
                np.int64
            )
            parts.append(
                _score_tagview_probed(spark, tag_files, tp, k, off, P, len(C))
            )
    if r_meta:
        parts.append(
            _score_meta(
                spark, f"{out_dir}/codes", qpdf.iloc[r_meta], k, off, ndoc=ndoc
            )
        )
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    return per_group_topk(
        scored, ["qid"], [F.col("dist").asc(), F.col("id").asc()], k
    ).select("qid", "id", "dist", "rank")
