#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing = full plan execution to a count() action (results materialized,
nothing collected to the driver beyond the count) — mirrors the
reference's batch wall-time measurement: `filter/run.py:15-52` runs each
query `run_count` times and reports `best_search_time = min(...)`; we do
the same with RUN_COUNT=2 warm runs after a JVM warm-up query.
"""

from __future__ import annotations

import json
import os
import sys
import time

RUN_COUNT = int(os.environ.get("SPARK_GRAFT_RUN_COUNT", "2"))
# A query is re-run (best-of-RUN_COUNT) unless its first run already
# exceeded this — 20s is above every query's clean runtime (heaviest
# ~5s warm), so the cutoff only stops reruns of something genuinely
# pathological, not of a normal query that caught a host-load burst.
# (r2 lesson: at 8s, one noisy 11.9s run of filtered_knn_router became
# the recorded number with no second chance.)
RERUN_BELOW_SEC = float(os.environ.get("SPARK_GRAFT_RERUN_BELOW_SEC", "20.0"))
# the 100k/1M scale points amplify host-load noise (minutes of compute
# in one job) — always take min-of-N for them even past the threshold,
# and record every run so a regression is distinguishable from one
# noisy window (VERDICT r4 #9).  Per-name counts: the multi-job 1M
# replays get min-of-2 (their 2x run-to-run spread needs a second
# sample, but a third would cost ~a minute of the bounded bench wall
# each — VERDICT r7 #7); the single-job scale points get min-of-3.
SCALE_RUN_COUNT = int(os.environ.get("SPARK_GRAFT_SCALE_RUN_COUNT", "3"))
# bail out of remaining reruns once a single run exceeds this: under a
# host-load burst a 90s replay run means the reruns would cost minutes
# of the bounded bench wall chasing a number the runs array already
# shows is noisy (the r8 verify run died at the 580s cap exactly here)
RERUN_HARD_STOP_SEC = float(os.environ.get("SPARK_GRAFT_RERUN_HARD_STOP_SEC", "90.0"))
# ... EXCEPT when run 1 is self-evidently a fault-tax artifact (VERDICT
# r9 wrong #1: the r9 record carries filtered_knn_yfcc_10m at 110.29 s
# vs a same-host 6.32 s min, sparse_mips_1m at 140.25 s vs an unchanged
# 12.77 s r8 record — the hard stop denied exactly the rerun that was
# most needed).  A row whose FIRST run exceeds TAXED_RATIO × its best
# recorded min gets exactly ONE more run while the wall allows it (see
# taxed_retry_granted); the taxed run stays in the runs array.
TAXED_RATIO = float(os.environ.get("SPARK_GRAFT_TAXED_RATIO", "3.0"))
#: builder quiet-window mins (docs/RESULTS_r{N}.md fresh-process
#: measurements) that beat any committed driver record — the only part
#: of the taxed-run baseline that still needs a hand entry, and only
#: until a driver record catches up (the derived history then wins).
HIST_SEED_SEC = {
    "filtered_knn_100k": 1.72,
    "filtered_knn_yfcc_100k": 4.15,
    "sparse_mips_100k": 2.07,
    "knn_ip_1m": 2.79,
    "knn_ip_1m_ivfsq": 3.16,
    "filtered_knn_yfcc_10m": 6.32,  # RESULTS_r9 fresh-process min
    "filtered_knn_yfcc_10m_ivf": 5.34,  # RESULTS_r9 pre-opt best
    "streaming_replay": 1.06,
    "streaming_replay_1m": 8.15,
    "streaming_replay_1m_clustered": 12.0,  # RESULTS_r8 builder min
}


def load_hist_min(root: str | None = None) -> dict[str, float]:
    """Per-row best recorded seconds, derived at startup from the
    committed BENCH_r*.json driver records (queries map + runs arrays)
    merged with HIST_SEED_SEC — VERDICT r10 wrong #4: the old
    hand-maintained table silently miscalibrated the taxed-run grant
    whenever an entry went stale; the history files are in the repo
    root every round, so read them instead.  Restricted to the
    grant-scoped rows (SCALE_BLOCK + streaming_replay) so derivation
    does not silently widen the grant to the ~55 sub-second registry
    rows (each grant costs a rerun; on a fully-taxed window that would
    add minutes against the hard wall for rows whose noise the min-of-2
    already absorbs)."""
    import glob

    if root is None:
        root = os.path.dirname(os.path.abspath(__file__))
    scope = SCALE_BLOCK | {"streaming_replay"}
    best = {k: v for k, v in HIST_SEED_SEC.items() if k in scope}
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = doc.get("parsed") if isinstance(doc, dict) else None
        if not isinstance(parsed, dict):
            continue
        vals: dict[str, list[float]] = {}
        for name, v in (parsed.get("queries") or {}).items():
            if isinstance(v, (int, float)):
                vals.setdefault(name, []).append(float(v))
        for name, arr in (parsed.get("runs") or {}).items():
            if isinstance(arr, list):
                vals[name] = vals.get(name, []) + [
                    float(v) for v in arr if isinstance(v, (int, float))
                ]
        for name, arr in vals.items():
            good = [v for v in arr if v > 0]  # -1.0 marks a failed row
            if good and name in scope:
                best[name] = min(best.get(name, float("inf")), min(good))
    return best
#: declared min-of-N HEADLINE rows — the bench's whole point is their
#: min-of-N operating numbers, so the global soft budget never degrades
#: them to single-run (VERDICT r9 wrong #3: by the time the loop reached
#: the OOD rows, taxed wall had eaten the soft budget and the min-of-3
#: gate rows recorded single-run — a protocol regression, not a plan
#: one).  Each is seconds per clean run; exempting them costs ~30 s
#: worst case against losing the round's gate comparison.
HEADLINE_MIN_N = {
    "filtered_knn_yfcc_10m_ivf",
    "sparse_mips_8m84_budget",
    "knn_ip_10m_ivfsq",
    "knn_ip_10m_ivfsq_lo",
}
# global soft budget for the TIMED loop: past this many seconds of
# measured wall, remaining queries run once (min-of-N degrades to
# single-run, recorded as a 1-entry runs array — visible, not silent).
# The driver's whole bench window is bounded; on a slow host min-of-3
# on every scale row would blow it and truncate the recorded line,
# which loses the entire bench round (r8: the first bench attempt on a
# fresh microVM host died mid-loop with nothing recorded).
SOFT_BUDGET_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_SOFT_BUDGET", "300.0"))
# PROCESS-start-anchored walls (r9): the r9 dry runs hit a 580 s
# external timeout mid-loop and recorded NOTHING (exit 124) — under the
# fault-taxed host the scale block alone can eat any window, and a
# scale query STARTED near the wall still straddles it (a taxed 1M
# replay runs 100-140 s).  Two cutoffs, both anchored at process start
# so warm/stage/prefault time counts: past SCALE_CUTOFF no new
# SCALE-block query starts (sub-second rows keep running — they cost
# seconds total); past HARD_WALL no query at all starts.  Skipped
# queries are listed on stderr + counted in the payload, and the JSON
# line still prints: a truncated-but-recorded bench beats a dead one.
# Defaults leave ~140 s of straddle headroom inside an ~800 s window
# (the r8 driver bench executed ~600-800 s of runs and recorded fine);
# tighter windows set both via env.  ADVICE r9 #4 (a taxed scale row
# started just under the cutoff can still straddle a 580 s external
# kill with nothing recorded) is closed by INCREMENTAL EMISSION instead
# of tighter walls: the loop prints the cumulative payload line after
# every scale row, so however the process dies the output tail carries
# the latest complete record — shrinking the cutoffs would instead
# sacrifice recorded rows on every healthy window.
SCALE_CUTOFF_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_SCALE_CUTOFF", "460.0"))
HARD_WALL_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_HARD_WALL", "640.0"))
RERUN_COUNTS = {
    "filtered_knn_100k": SCALE_RUN_COUNT,
    "sparse_mips_100k": SCALE_RUN_COUNT,
    "knn_ip_1m": SCALE_RUN_COUNT,
    "knn_ip_1m_ivfsq": SCALE_RUN_COUNT,
    # the 10M anchor (knn_ip_10m) is deliberately NOT here: one run is
    # ~30-60 s of pure BLAS (7.9 Tflop), so min-of-3 would triple the
    # bench wall for a number whose noise floor the 1M anchor already
    # records; RERUN_BELOW_SEC keeps it single-run
    "knn_ip_10m_ivfsq": SCALE_RUN_COUNT,
    "knn_ip_10m_ivfsq_lo": SCALE_RUN_COUNT,
    # multi-job replay: the only non-scale query whose +0.7s r5 wobble
    # had no runs array to prove it was host noise (VERDICT r5 #8)
    "streaming_replay": SCALE_RUN_COUNT,
    # r7 recorded streaming_replay_1m single-run (49.98 s) against a
    # 23-46 s warm dev spread — indistinguishable from regression;
    # min-of-2 with the runs array recorded (VERDICT r7 #5 hygiene)
    "streaming_replay_1m": 2,
    # r8 recorded this single-run at 84.22 s against a 12-111 s same-host
    # spread (first-run arena growth) — min-of-2 with the runs array
    # recorded so the number stops carrying the cold tax (VERDICT r8 #2)
    "streaming_replay_1m_clustered": 2,
    # the 1M sparse segment scan: run 1 carries the in-JVM cold cost,
    # run 2 is the serving number.  The 8.84M EXACT points
    # (sparse_mips_8m84*) are registry-checked but deliberately NOT
    # benched: the exact scan measured 74-261 s run-to-run (1.16 G
    # scored postings amplify host noise ~3.5x) — one bad window would
    # eat the driver's whole bench budget; quiet-host numbers live in
    # docs/RESULTS_r8.md.  The budgeted 8.84M point is cheap (~6 s).
    "sparse_mips_1m": 2,
    "sparse_mips_8m84_budget": 2,
    # yfcc-shaped filter rows (r8): the 100k mixed-route point is cheap
    # (min-of-3); the 10M point is several seconds per run — min-of-2
    # keeps a runs array without blowing the bounded wall
    "filtered_knn_yfcc_100k": SCALE_RUN_COUNT,
    "filtered_knn_yfcc_10m": 2,
    "filtered_knn_yfcc_10m_ivf": 2,
}

#: the expensive scale rows — ONLY these are gated by SCALE_CUTOFF.
#: Explicit set, not a substring match: r9's `"streaming_replay" in
#: name` token also matched the ~2 s `streaming_replay` row and skipped
#: it for two rounds (VERDICT r9 missing #1).
SCALE_BLOCK = {
    "filtered_knn_100k",
    "filtered_knn_yfcc_100k",
    "sparse_mips_100k",
    "knn_ip_1m",
    "knn_ip_1m_ivfsq",
    "filtered_knn_yfcc_10m",
    "filtered_knn_yfcc_10m_ivf",
    "streaming_replay_1m",
    "streaming_replay_1m_clustered",
    "sparse_mips_1m",
    "sparse_mips_8m84_budget",
    "knn_ip_10m_ivfsq",
    "knn_ip_10m_ivfsq_lo",
    "knn_ip_10m",
}

#: the taxed-run grant baseline: derived from history at import, not
#: hand-edited (see load_hist_min)
HIST_MIN_SEC = load_hist_min()

BENCH_QUERIES = [
    # ---- the scale block runs FIRST (r8): these rows are min-of-N, so
    # their run 1 absorbs worker-arena page-fault growth (see the warm
    # note above) and the min discards it; running them late instead
    # meant the global soft budget stripped exactly these rows' reruns
    # and recorded first-run-inflated numbers.  Page-cache eviction —
    # the old reason the 10M rows ran last — is moot on hosts whose RAM
    # holds the whole fixture set, and the prefault pass above re-warms
    # the file pages either way.
    "filtered_knn_100k",
    "filtered_knn_yfcc_100k",
    "sparse_mips_100k",
    "knn_ip_1m",
    "knn_ip_1m_ivfsq",
    # scale rows ordered RECORD-DEBT-FIRST / CHEAPEST-FIRST (VERDICT
    # r10 wrong #1): r10 ran the 100-250 s yfcc pair before every row
    # with an outstanding record debt, and on a taxed window the cutoff
    # then skipped all 7 downstream rows — the OOD gate record stayed
    # r8's, the clustered replay has never had a non-taxed driver
    # number.  The ~45 s (quiet-window) debt rows below cannot be
    # starved by one taxed 100 s+ row if they run first; the yfcc pair
    # still records on any window that r10 would also have recorded it.
    "knn_ip_10m_ivfsq",
    "knn_ip_10m_ivfsq_lo",
    "sparse_mips_8m84_budget",
    "streaming_replay_1m",
    "streaming_replay_1m_clustered",
    "sparse_mips_1m",
    "filtered_knn_yfcc_10m",
    "filtered_knn_yfcc_10m_ivf",
    # the exact 10M anchor runs LAST in the scale block (r9): it is the
    # single most expensive row (30-170 s depending on host weather)
    # and carries the least information per second — under the scale
    # cutoff it is the right row to sacrifice, not the baseline-
    # comparison replays (the r9 dry run skipped exactly those).  The
    # 1M anchor above still warms the scan kernel's allocation size
    # classes, and the no-trim worker heaps keep them warm here.
    "knn_ip_10m",
    # ---- the sub-second registry rows; the soft budget may single-run
    # the tail of this section on a slow host, which costs nothing
    "knn_l2",
    "knn_cosine",
    "filtered_knn_router",
    "filtered_knn_meta",
    "filtered_knn_scan",
    "tag_doc_freq",
    "tag_signatures",
    "sparse_mips",
    "hybrid_rrf_search",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast",
    "events_hourly",
    "events_sessionize",
    "events_asof_join",
    "signup_click_conversion",
    "streaming_replay",
    "ivf_full_probe",
    "pq_adc_knn",
    "ivfpq_knn",
    "sq_knn",
    "ivfsq_knn",
    "tag_partition_knn",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash",
    "dedup_simhash",
    "embedding_near_dup",
    "doc_fingerprint",
    "token_stats",
    "text_quality",
    "text_repetition",
    "eval_contamination",
    "pii_scrub",
    "corpus_mix_allocation",
    "dedup_substring_windows",
    "dedup_substring_windows_hashed",
    "lang_id_ngram",
    "media_features",
    "media_decode_stats",
    "uint8_knn",
    "binfmt_roundtrip",
    "lsh_cosine_knn",
    "range_search_uint8",
    "tag_pair_doc_freq",
    "token_stats_bpe",
    "dedup_filtered_corpus",
    "corpus_split",
    "corpus_token_quantiles",
    "corpus_stratified_sample",
    "filtered_knn_sig",
    "tag_pair_partition_knn",
    "sparse_csr_roundtrip",
    "streaming_clustered_replay",
    "streaming_dedup",
    # per-row documentation for the scale block above lives with the
    # registrations in queries/scale.py; knn_ip_100k is correctness-
    # gated but NOT benched (one long BLAS job amplifies host noise
    # 5-10x — knn_ip_1m is the bigger, less-constant-dominated anchor),
    # and the exact 8.84M sparse anchors stay un-benched for variance
    # (see RERUN_COUNTS).
    "events_hourly_stream",
    # embedding_near_dup_lsh is correctness-gated but not benched: at
    # τ=0.45 hyperplane buckets barely prune (63° pairs collide in most
    # bands), so at fixture scale the exact BLAS path is simply the right
    # plan — the bucketed path exists for corpora past the broadcast cap
]


def taxed_retry_granted(name: str, dt: float, runs_done: int, elapsed: float) -> bool:
    """Grant ONE rerun when a row is about to record from a single run
    that is a fault-tax artifact — over TAXED_RATIO× the row's recorded
    min (VERDICT r9 wrong #1: never record a known-taxed single run as
    the official number).  The caller applies this at every would-be
    exit after run 1: the hard stop, the RERUN_BELOW break, and an
    exhausted run budget.  The taxed run stays in the runs array.

    Wall guard: inside the scale cutoff the grant is unconditional;
    past it (the taxed run itself may have pushed the loop over — the
    exact case the grant exists for) it is still given while a
    conservatively-taxed rerun (TAXED_RATIO × the recorded min) fits
    under the hard wall, since incremental emission bounds the loss if
    even that estimate is wrong."""
    hist = HIST_MIN_SEC.get(name)
    return (
        runs_done == 1
        and hist is not None
        and dt > TAXED_RATIO * hist
        and (
            elapsed < SCALE_CUTOFF_SEC
            or elapsed + TAXED_RATIO * hist < HARD_WALL_SEC
        )
    )


def main() -> None:
    t_proc = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from filter_vectordb_spark import get_spark, registry

    spark = get_spark("bench")
    # JVM/Arrow warm-up on the smallest fixture so codegen &c. are not
    # attributed to the first measured query
    registry.QUERIES["knn_l2"](spark, "/root/testdata/sf0.001").count()
    # Worker-heap warmth is handled by ORDER, not an explicit fault job:
    # session.py pins glibc to keep large blocks on the heap (no
    # mmap/trim), so a worker pays its page-fault cost once per
    # allocation size class.  The timed loop below runs the min-of-N
    # scale rows FIRST — their run 1 absorbs the arena growth and the
    # min discards it — and an explicit 600 MB/worker pre-fault job
    # measured 236 s of the bounded window on the microVM host (fault
    # throughput there is ~80 MB/s), which is exactly the cost the
    # discarded first runs absorb for free.
    # Index fit() is not search: build the per-sf_dir index caches before
    # the timed loop, mirroring the reference's fit-then-measure protocol
    # (`filter/run.py:15-52` — BASELINE QPS numbers exclude build time).
    # The timed invocations below then serve from the saved indexes.
    #
    # The warm list is MINIMAL (r8 trim — the verify bench run overran
    # the 580s window): every query measured at min-of-N absorbs any
    # residual first-run build cost in run 1 and the min discards it,
    # and the index caches persist per host anyway, so warming those
    # names bought nothing on a warm host and ~40s of wall every run.
    # What stays is what a SINGLE-RUN timed query would otherwise pay:
    # r11: the min-of-2 registry rows that fit a per-sf_dir index on
    # first call are warmed too — on a FRESH host (no /tmp cache) even
    # the second run can land behind a >RERUN_BELOW_SEC first run and
    # the recorded number is then fit+search (r11 before-run: sq_knn
    # 33.9 s vs ~1.1 s warm, ivfpq_knn 30.5 vs ~1.6 — both single-run
    # because run 1 blew the 20 s rerun cutoff).  fit() is not search
    # (the reference's QPS protocol, filter/run.py): one untimed
    # invocation each moves the build into staging where the protocol
    # already puts every other index; on a warm host each costs ~1 s.
    for warm in (
        "knn_ip_1m_ivfsq",  # stages the 1M base + builds the IVF+SQ8 index
        "knn_ip_10m_ivfsq",  # stages the 10M base + builds IVF(3200)+SQ8
        #   (the 10M staging is ~20 min cold — it must never land inside
        #   the single-run knn_ip_10m anchor's timing)
        # ood_recall_curve_10m is NOT warmed here: its 6-point sweep is
        # ~1-2 min of wall against a bounded bench budget, its index/gt
        # staging is covered by the knn_ip_10m_ivfsq warm above, and the
        # driver's correctness sweep refreshes the persisted curve
        # artifact every round anyway
        # the per-sf_dir index fits (r11 note above): ivf16 / pq32x64 /
        # sq8 / ivfsq16 / ivfpq16_32x64 / tagpart / tagpair / tagstats /
        # lsh16 / langprof caches
        "ivf_full_probe",
        "pq_adc_knn",
        "sq_knn",
        "ivfsq_knn",
        "ivfpq_knn",
        "tag_partition_knn",
        "tag_pair_partition_knn",
        "filtered_knn_router",
        "lsh_cosine_knn",
        "lang_id_ngram",
        # not an index build: first stateful-stream start pays one-time
        # Python worker + state-store spin-up (~10s); warm it so the
        # timed entry measures the stream, not engine init
        "streaming_dedup",
    ):
        t0 = time.perf_counter()
        registry.QUERIES[warm](spark, sf_dir).count()
        print(
            f"bench: warm {warm} {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    # fixture staging for the r8 scale points, fit-not-search: the 1M
    # sparse segment layout IS sparse_mips_1m's index (term-sorted
    # range-partitioned segments), and the clustered corpus + runbook
    # are streaming_replay_1m_clustered's dataset — both one-time
    # builds the reference also excludes from its QPS (BASELINE
    # protocol); cheap no-ops once the /tmp cache exists
    from filter_vectordb_spark.queries import fixtures as _fx

    for stager in (
        _fx._synth_sparse1m_terms_dir,
        _fx._synth_sparse1m_queries,
        # r12: the plain 1M replay base too — streaming_replay_1m is a
        # single-run row, and the stagers now self-heal a coarse file
        # layout (a cache staged by a low-core session caps scan-kernel
        # task units; see fixtures._BASE_FILES); the regenerate must
        # land here, never inside the timed run
        _fx._synth_msturing1m,
        _fx._synth_msturing1m_clustered,
        # the yfcc filtered-serving index (stats/grid/codes/tagview/pair)
        # is fit(), not search — ~minutes cold at 10M, never inside the
        # timed runs
        _fx._yfcc100k_index,
        _fx._yfcc10m_index,
        _fx._yfcc_queries_8192,
    ):
        t0 = time.perf_counter()
        _fx_result = stager(spark)
        print(
            f"bench: stage {stager.__name__} {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    # page-cache pre-fault of the single-run/cold-sensitive fixtures:
    # one sequential pass (NVMe ~1-2 GB/s) so the timed scans measure
    # compute + decode, not cold random IO — the protocol the BASELINE
    # engines use (the reference loads the whole dataset into RAM
    # before timing, `benchmark/datasets.py` xbin_mmap readers).  The
    # measured effect on this host: the 7.7 GB 10M anchor read cold at
    # 51-58 s vs 28-33 s page-warm.
    import glob as _glob

    t0 = time.perf_counter()
    nbytes = 0
    from filter_vectordb_spark.queries.core import _index_cache_dir

    for d in (
        _index_cache_dir("synth10m_v2", "base"),
        _index_cache_dir("synth1m_v2", "base"),
        _fx._synth_sparse1m_terms_dir(spark),
        _fx._synth_sparse8m84_skewed_terms_dir(spark),
        # yfcc 10M serving data: the metadata-first codes table and the
        # frequent-tag view are what the timed routes actually read
        # r9: serving reads the memmap sidecars (meta_bin/ + tag_bin/),
        # not the codes/tagview parquet — prefault what the routes touch
        _index_cache_dir("yfcc10m_v2", "fidx_v4/meta_bin"),
        _index_cache_dir("yfcc10m_v2", "fidx_v4/tag_bin"),
    ):
        # recursive, all extensions: .codes.bin + the npy sidecars
        for p in _glob.glob(os.path.join(d, "**", "*.*"), recursive=True):
            with open(p, "rb", buffering=0) as f:
                while True:
                    blk = f.read(8 << 20)
                    if not blk:
                        break
                    nbytes += len(blk)
    print(
        f"bench: prefault {nbytes / 1e9:.1f} GB {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )

    # Python-worker arena pre-size + heavy-import warm-up (guide §4.5,
    # VERDICT r11 #7).  One task per worker: import the heavy kernel
    # modules and touch a large block once, then free it — the pinned
    # allocator (session._MALLOC_ENV) keeps the grown heap for the life
    # of the reused worker, so the timed FIRST run of each heavy query
    # faults pages that are already guest-resident instead of paying
    # the microVM host-refault tax on a fresh arena.  Root-caused this
    # round: sparse_mips_1m recorded runs [47.9, 4.8] with the whole gap
    # in first-touch faults of fresh worker memory (standalone 32-proc
    # repro: phase sums 412 s topk / 168 s expand on the first wave vs
    # 70 s / 3 s on the second, identical code and data; JVM task CPU
    # ~0 — the tax is host-side page refault, ~45 µs/page).  Process
    # warm-up only — the Python analog of the JVM spark.range warm-up
    # above; no query data or results are touched.
    # sized to the heaviest kernels' per-worker peak (~0.5-1 GB, session
    # notes); parameterised like the other scale knobs — on a real
    # cluster this is per-executor-worker sizing, not a local constant
    warm_mb = int(os.environ.get("SPARK_GRAFT_ARENA_WARM_MB", "768"))

    def _arena_warm(it):
        import numpy as _np
        import pyarrow.parquet  # noqa: F401 — heavy import, once per worker
        from filter_vectordb_spark.index import filteridx_kernels  # noqa: F401
        from filter_vectordb_spark.operators import knn as _knn  # noqa: F401

        a = _np.ones(warm_mb << 20, dtype=_np.int8)  # grow + touch the arena
        a[::4096].sum()  # keep the touch from being optimized away
        del a  # freed block stays in the pinned arena (no trim/munmap)
        for b in it:
            yield b

    t0 = time.perf_counter()
    ncpu = spark.sparkContext.defaultParallelism
    spark.range(0, ncpu, 1, ncpu).mapInArrow(_arena_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    print(
        f"bench: worker arena warm x{ncpu} {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}  # per-run times for the scale points
    t_loop = time.perf_counter()
    # localCheckpoint blocks (replay state snapshots) are freed by the
    # ContextCleaner only after the Python refs drop AND the JVM GCs;
    # force both after a STATE-HEAVY query so its successor doesn't pay
    # the old-gen tax (observed 6× on queries following a replay).  A
    # JVM full GC after every one of ~67 queries costs ~a minute of the
    # bounded bench wall for nothing — only these leave big state behind.
    GC_AFTER = ("streaming_", "knn_ip_1m", "knn_ip_10m", "_100k", "_1m")
    gc_pending = False
    import gc

    skipped: list[str] = []
    for name in BENCH_QUERIES:
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        elapsed = time.perf_counter() - t_proc
        is_scale = name in SCALE_BLOCK
        if elapsed > HARD_WALL_SEC or (is_scale and elapsed > SCALE_CUTOFF_SEC):
            skipped.append(name)
            continue
        spark.catalog.clearCache()  # queries are independent; no carry-over
        if gc_pending:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        gc_pending = any(tok in name for tok in GC_AFTER)
        try:
            # best-of-RUN_COUNT, the reference's measurement protocol
            # (filter/run.py:36: best_search_time = min over run_count).
            # Re-runs are skipped once a run exceeds RERUN_BELOW_SEC: the
            # min matters where per-job scheduling noise is comparable to
            # the runtime, and the wall budget for the whole bench is
            # bounded (driver timeout) — long queries keep their first
            # warm measurement.
            best = float("inf")
            n_runs = RERUN_COUNTS.get(name, RUN_COUNT)
            if (
                time.perf_counter() - t_loop > SOFT_BUDGET_SEC
                and name not in HEADLINE_MIN_N
            ):
                n_runs = 1  # over soft budget: single-run the rest
            taxed_retry = False
            r = 0
            while r < n_runs:
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = min(best, dt)
                r += 1
                # taxed-run grant: whenever the loop is ABOUT TO make a
                # single taxed run the official number — n_runs
                # exhausted after run 1 (soft-budget rows), the
                # RERUN_BELOW break (the single-run knn_ip_10m anchor),
                # or the hard stop — give it one more run while the
                # wall allows.  Min-of-N rows that run their full count
                # self-heal without a grant.  The taxed run stays in
                # the runs array so the artifact is visible.
                stop_hard = name in RERUN_COUNTS and dt >= RERUN_HARD_STOP_SEC
                stop_below = name not in RERUN_COUNTS and best >= RERUN_BELOW_SEC
                will_stop = stop_hard or stop_below or r >= n_runs
                grant = (
                    not taxed_retry
                    and will_stop
                    and taxed_retry_granted(
                        name, dt, r, time.perf_counter() - t_proc
                    )
                )
                if name in RERUN_COUNTS or grant or taxed_retry:
                    runs.setdefault(name, []).append(round(dt, 3))
                if grant:
                    taxed_retry = True
                    n_runs = r + 1
                    continue
                if stop_hard or stop_below:
                    break
            timings[name] = round(best, 2)
            print(f"bench: {name} {timings[name]}s", file=sys.stderr)
            if name in taxed_rows(timings):
                print(f"bench: {name} recorded TAXED", file=sys.stderr)
            if is_scale:
                # incremental emission: after every scale row, print the
                # cumulative payload line so an external kill mid-loop
                # (the r9 580 s dry-run failure mode) still leaves the
                # latest complete record in the output tail — the walls
                # bound the straddle, this bounds the loss when they
                # don't (ADVICE r9 #4).  Normal exit still ends with the
                # full line as the LAST line.
                print(
                    format_bench_line(
                        make_payload(timings, runs, sf, t_proc, partial=True)
                    )
                )
        except Exception as exc:  # keep the bench line emittable
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
    # ---- end-of-loop taxed-record retry (VERDICT r10 wrong #2): a row
    # whose recorded min is still > TAXED_RATIO × its history min saw
    # only taxed windows during the block — the in-loop grant already
    # spent its one rerun and the window stayed bad.  While the hard
    # wall allows, give such rows one more attempt each, most valuable
    # first (the baseline gate rows), so a transient tax early in the
    # window cannot be the round's official number when the window
    # recovered by the end.  Each attempt lands in the runs array; the
    # recorded min only improves.
    RETRY_ORDER = [
        "filtered_knn_yfcc_10m_ivf",
        "knn_ip_10m_ivfsq_lo",
        "knn_ip_10m_ivfsq",
        "sparse_mips_8m84_budget",
        "streaming_replay_1m",
        "streaming_replay_1m_clustered",
        "sparse_mips_1m",
        "filtered_knn_yfcc_10m",
    ]
    for name in RETRY_ORDER:
        hist = HIST_MIN_SEC.get(name)
        t = timings.get(name)
        if t is None or t < 0 or hist is None or t <= TAXED_RATIO * hist:
            continue
        elapsed = time.perf_counter() - t_proc
        if elapsed + TAXED_RATIO * hist >= HARD_WALL_SEC:
            continue
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        try:
            registry.QUERIES[name](spark, sf_dir).count()
        except Exception as exc:
            print(f"bench: retry {name} failed: {exc}", file=sys.stderr)
            continue
        dt = time.perf_counter() - t0
        runs.setdefault(name, []).append(round(dt, 3))
        if dt < timings[name]:
            timings[name] = round(dt, 2)
        print(f"bench: retry {name} {dt:.2f}s", file=sys.stderr)
        print(
            format_bench_line(
                make_payload(timings, runs, sf, t_proc, partial=True)
            )
        )
    payload = make_payload(timings, runs, sf, t_proc)
    if skipped:
        print(f"bench: wall cutoffs hit, skipped: {skipped}", file=sys.stderr)
        payload["skipped"] = len(skipped)
        # re-round-trip bench_wall after the skip key lands last
        payload["bench_wall"] = round(time.perf_counter() - t_proc, 1)
    print(format_bench_line(payload))
    spark.stop()


def taxed_rows(timings: dict[str, float]) -> list[str]:
    """Rows whose recorded best is still a fault-tax artifact — over
    TAXED_RATIO × the row's history min (VERDICT r10 wrong #2: the
    headline queries map used to carry a taxed record silently; the
    `taxed` payload key makes it machine-distinguishable from a
    regression)."""
    return sorted(
        n
        for n, t in timings.items()
        if t > 0
        and n in HIST_MIN_SEC
        and t > TAXED_RATIO * HIST_MIN_SEC[n]
    )


def make_payload(
    timings: dict[str, float],
    runs: dict[str, list[float]],
    sf: str,
    t_proc: float,
    partial: bool = False,
) -> dict:
    """Assemble the bench JSON payload.  The metric name stays
    `headline_queries_total_wall` on partial lines too (ADVICE r10
    considered a distinct name, but a consumer that only knows the real
    metric would then record NOTHING from a killed run — the
    `partial: true` key is the marker; last-line-wins consumers are
    already correct)."""
    payload = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(t for t in timings.values() if t >= 0), 2),
        "unit": "sec",
        "queries": dict(timings),
        "runs": {k: [round(t, 2) for t in v] for k, v in runs.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    tx = taxed_rows(timings)
    if tx:
        payload["taxed"] = tx
    if partial:
        payload["partial"] = True
    payload["bench_wall"] = round(time.perf_counter() - t_proc, 1)
    return payload


def format_bench_line(payload: dict, limit: int = 1950) -> str:
    """Serialize the bench payload to the ONE recorded JSON line.

    The driver records (and parses) only the LAST 2000 chars of output —
    r6's 2.1 KB line came back "parsed": null.  Compact separators +
    2-decimal rounding keep the line inside the window; past it anyway,
    the per-run arrays spill to stderr first, then per-query precision
    adapts (>=100 s rows to 1-s, >=10 s rows to 0.1-s resolution — no
    row whose timing needs that many digits loses information at that
    precision), then (belt + braces) the per-query map is truncated to
    the scale points so the headline total always survives.  Unit-tested
    in tests/test_bench.py — the spill branches must work the round the
    registry outgrows the window, not be discovered then (VERDICT r7 #7)."""
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > limit and "runs" in payload:
        print(f"bench runs: {payload.pop('runs')}", file=sys.stderr)
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > limit and "queries" in payload:
        payload["queries"] = {
            k: (int(round(v)) if v >= 100 else round(v, 1) if v >= 10 else v)
            for k, v in payload["queries"].items()
        }
        line = json.dumps(payload, separators=(",", ":"))
    if len(line) > limit:
        q = payload.get("queries", {})
        keep = {k: v for k, v in q.items() if any(t in k for t in ("_1m", "_10m", "_100k", "streaming_"))}
        print(f"bench queries (full): {q}", file=sys.stderr)
        payload["queries"] = keep
        payload["queries_truncated"] = len(q) - len(keep)
        line = json.dumps(payload, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
