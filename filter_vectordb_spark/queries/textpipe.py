"""LLM-pipeline text analysis: fingerprints, token stats, quality, repetition, contamination, PII, language ID (registered queries + DuckDB oracles).

Split out of the monolithic registry (VERDICT r6 #8); see
filter_vectordb_spark.queries.core for the shared registry surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filter_vectordb_spark.queries.core import (
    ORACLES,
    _index_cache_dir,
    _is_built,
    register,
)

# ------------------------------------------------- LLM-pipeline: text analysis

from filter_vectordb_spark.functions.text import (  # noqa: E402
    STOPWORDS,
    doc_fingerprint,
    duckdb_char_hash_sql,
    quality_flags,
    quality_score,
)

# DuckDB tokenization fragment — identical to functions/text.py::tokens
_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"
_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@register(
    "doc_fingerprint",
    f"""
SELECT doc_id, {duckdb_char_hash_sql('text')} AS fp
FROM documents
""",
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (exact-dup key)."""
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fp"))


@register(
    "token_stats",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_uniq_tokens,
       len(list_filter(toks, t -> list_contains({_STOP_LIST}, t))) AS n_stopwords
FROM t
""",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (token counting op)."""
    from filter_vectordb_spark.functions.text import (
        stopword_count,
        token_count,
        uniq_token_count,
    )
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        uniq_token_count(t).alias("n_uniq_tokens"),
        stopword_count(t).alias("n_stopwords"),
    )


@register(
    "text_quality",
    f"""
WITH t AS (SELECT doc_id, n_chars, {_TOKS} AS toks FROM documents),
f AS (SELECT doc_id,
             len(toks) AS nt,
             len(list_distinct(toks)) AS nu,
             len(list_filter(toks, t -> list_contains({_STOP_LIST}, t))) AS sw,
             n_chars
      FROM t)
SELECT doc_id,
       (nt >= 5 AND nt <= 1000) AS len_ok,
       (nu * 4 >= nt) AS diversity_ok,
       (sw > 0) AS stopword_ok,
       (n_chars >= 20 AND n_chars <= 10000) AS chars_ok,
       CAST(
         CAST(nt >= 5 AND nt <= 1000 AS INT) + CAST(nu * 4 >= nt AS INT)
         + CAST(sw > 0 AS INT) + CAST(n_chars >= 20 AND n_chars <= 10000 AS INT)
       AS INT) AS quality
FROM f
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style integerized quality gates + 0-4 score."""
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    fl = quality_flags(F.col("text"), F.col("n_chars"))
    return docs.select(
        "doc_id",
        fl["len_ok"].alias("len_ok"),
        fl["diversity_ok"].alias("diversity_ok"),
        fl["stopword_ok"].alias("stopword_ok"),
        fl["chars_ok"].alias("chars_ok"),
        quality_score(F.col("text"), F.col("n_chars")).alias("quality"),
    )


from filter_vectordb_spark.functions.text import duckdb_ngrams_sql as _ngrams_sql  # noqa: E402


@register(
    "text_repetition",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, toks,
             {_ngrams_sql('toks', 2)} AS g2,
             {_ngrams_sql('toks', 3)} AS g3
      FROM t),
c AS (SELECT doc_id,
             len(toks) AS n_words,
             COALESCE(list_max(list_transform(list_distinct(toks),
                 w -> len(list_filter(toks, x -> x = w)))), 0) AS top_word_count,
             len(g2) AS n_2grams, len(list_distinct(g2)) AS n_uniq_2grams,
             len(g3) AS n_3grams, len(list_distinct(g3)) AS n_uniq_3grams
      FROM g)
SELECT doc_id, n_words, top_word_count, n_2grams, n_uniq_2grams,
       n_3grams, n_uniq_3grams,
       (top_word_count * 5 > n_words
        OR (n_2grams - n_uniq_2grams) * 5 > n_2grams
        OR (n_3grams - n_uniq_3grams) * 5 > n_3grams) AS repetitive
FROM c
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates (Rae et al. 2021 §A1.1: fraction of
    duplicate word n-grams / most-frequent-word mass), integerized so the
    oracle compare is exact: a doc is `repetitive` when its top word
    carries >20% of the words or >20% of its 2-grams or 3-grams are
    duplicates.  Pure codegen'd SQL expressions per row — no shuffle, no
    Python — so the gate runs at scan speed on any corpus size."""
    from filter_vectordb_spark.functions.text import (
        ngrams_of_tokens,
        tokens,
        top_token_count,
    )
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    g = t.select(
        "doc_id",
        "toks",
        ngrams_of_tokens(F.col("toks"), 2).alias("g2"),
        ngrams_of_tokens(F.col("toks"), 3).alias("g3"),
    )
    c = g.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        top_token_count(F.col("toks")).alias("top_word_count"),
        F.size("g2").alias("n_2grams"),
        F.size(F.array_distinct("g2")).alias("n_uniq_2grams"),
        F.size("g3").alias("n_3grams"),
        F.size(F.array_distinct("g3")).alias("n_uniq_3grams"),
    )
    return c.select(
        "*",
        (
            (F.col("top_word_count") * 5 > F.col("n_words"))
            | ((F.col("n_2grams") - F.col("n_uniq_2grams")) * 5 > F.col("n_2grams"))
            | ((F.col("n_3grams") - F.col("n_uniq_3grams")) * 5 > F.col("n_3grams"))
        ).alias("repetitive"),
    )


_CONTAM_N = 4  # word n-gram size for train/eval overlap
_CONTAM_EVAL_IDS = 16  # doc_id < this = the held-out eval slice (deterministic)


@register(
    "eval_contamination",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, list_distinct({_ngrams_sql('toks', _CONTAM_N)}) AS grams FROM t),
ev AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id < {_CONTAM_EVAL_IDS}),
tr AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id >= {_CONTAM_EVAL_IDS}),
h AS (SELECT ev.doc_id, count(*) AS n_hit FROM ev JOIN tr USING (gram) GROUP BY ev.doc_id)
SELECT g.doc_id,
       len(grams) AS n_grams,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_contaminated,
       (len(grams) > 0 AND COALESCE(h.n_hit, 0) * 4 >= len(grams)) AS contaminated
FROM g LEFT JOIN h ON g.doc_id = h.doc_id
WHERE g.doc_id < {_CONTAM_EVAL_IDS}
""",
)
def eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram decontamination check (the GPT-3 appendix-C /
    PaLM methodology): for each held-out eval document, how many of its
    distinct word {_CONTAM_N}-grams appear anywhere in the training
    corpus; flagged when ≥25% overlap (integer cross-multiply, exact
    oracle compare).

    Spark-first shape: distinct grams per doc are computed row-wise
    (codegen, no Python), eval grams explode to (doc_id, gram), train
    grams explode to a distinct gram set, and the overlap is one
    hash-join on the gram string with map-side combine on both explodes —
    exactly the shuffle-on-fingerprint layout a 100 TB decontamination
    pass uses (swap the string for a 64-bit gram hash at scale; the
    join key cardinality is what matters, not the representation)."""
    from filter_vectordb_spark.functions.text import ngrams_of_tokens, tokens
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    g = docs.select(
        "doc_id",
        F.array_distinct(
            ngrams_of_tokens(tokens(F.col("text")), _CONTAM_N)
        ).alias("grams"),
    )
    ev = g.filter(F.col("doc_id") < _CONTAM_EVAL_IDS)
    tr_grams = (
        g.filter(F.col("doc_id") >= _CONTAM_EVAL_IDS)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    ev_grams = ev.select("doc_id", F.explode("grams").alias("gram"))
    hits = (
        ev_grams.join(tr_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        ev.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
            # a doc with zero n-grams (< n tokens) carries no overlap
            # evidence — without the size guard 0*4 >= 0 flags it
            (
                (F.size("grams") > 0)
                & (F.coalesce(F.col("n_hit"), F.lit(0)) * 4 >= F.size("grams"))
            ).alias("contaminated"),
        )
    )


_SUBSTR_L = 30  # char window length for exact-substring duplication


def _substring_windows(docs: DataFrame, key_col) -> DataFrame:
    """Shared shape of both substring-dedup variants (r11 rewrite,
    guide §2.3/§2.4 — measured 6.4 → 2.3 s string / 3.2 → 2.1 s hashed
    at sf0.1, bit-identical output):

    - Windows come from ONE Generate: explode the OFFSET sequence and
      take substring(text, i, L) as a top-level codegen'd projection.
      The old plan evaluated an interpreted `transform(..., lambda)`
      Generate TWICE (once feeding the count aggregate, once the join
      probe side) — one full extra pass over corpus chars.
    - The per-window corpus count is `sum(m) OVER (PARTITION BY win)`
      instead of groupBy(win) + join back: ONE exchange of the window
      rows replaces the old aggregate exchange + join-probe exchange,
      i.e. the corpus-sized data crosses the network once, not twice
      (the WindowExec sort is work a sort-merge join would also pay at
      the scale where the count side stops broadcasting).
    - Skew guard (r12, guide §2.5 / VERDICT r11 #3): between the wide
      exchange and the window, a (win, doc_id) aggregate collapses
      within-doc repeats of a window to ONE row carrying its
      multiplicity m.  The exchange is already keyed on win, so the
      aggregate and the window both reuse its partitioning (plan stays
      1 Generate / 2 Exchange); what changes is what WindowExec must
      BUFFER for a hot key: distinct docs containing the window, not
      every occurrence — a whitespace-run/boilerplate document (the
      realistic 100 TB heavy hitter: ONE doc repeating one window
      millions of times) now contributes one row to the sort+buffer
      instead of millions, streamed through a bounded hash table.  Per-
      doc totals weight by m, so results are value-identical (pinned by
      the shared DuckDB oracle and test_plans.py).

    Guard docs shorter than L chars: sequence(1, non-positive) counts
    DOWN in Spark, which would fabricate windows the oracle (whose
    range() yields an empty list) never sees."""
    from pyspark.sql import Window

    L = _SUBSTR_L
    w = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.expr(
                f"CASE WHEN length(text) >= {L} THEN"
                f" sequence(1, length(text) - {L} + 1)"
                f" ELSE array() END"
            )
        ).alias("i"),
    ).select("doc_id", key_col)
    key = w.columns[1]
    dw = w.repartition(key).groupBy(key, "doc_id").agg(F.count("*").alias("m"))
    wn = dw.withColumn("n", F.sum("m").over(Window.partitionBy(key)))
    d = wn.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_windows"),
        F.sum(F.when(F.col("n") > 1, F.col("m")).otherwise(0))
        .cast("long")
        .alias("n_dup_windows"),
    )
    return d.select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        (F.col("n_dup_windows") * 5 > F.col("n_windows")).alias("substring_dup"),
    )


@register(
    "dedup_substring_windows",
    f"""
WITH w AS (SELECT doc_id,
                  unnest([substr(text, i, {_SUBSTR_L})
                          for i in range(1, len(text) - {_SUBSTR_L} + 2)]) AS win
           FROM documents),
c AS (SELECT win, count(*) AS n FROM w GROUP BY win),
d AS (SELECT w.doc_id,
             count(*) AS n_windows,
             CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
      FROM w JOIN c USING (win) GROUP BY w.doc_id)
SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows, n_dup_windows,
       (n_dup_windows * 5 > n_windows) AS substring_dup
FROM d
""",
)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    {_SUBSTR_L}-char sliding window of every document, counted across the
    corpus; a document is flagged when >20% of its windows occur more
    than once corpus-wide.  This is the windowed variant of the paper's
    suffix-array method — the distributed shape is one explode → one
    exchange keyed on the window (count-over-partition) → per-doc
    aggregate, i.e. corpus chars cross the network once (a 64-bit
    rolling hash replaces the string key at 100 TB; the exchange
    cardinality, not the representation, is the cost)."""
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    # substring with a dynamic start index needs SQL expr (the Python
    # F.substring signature takes literal positions only)
    win = F.expr(f"substring(text, i, {_SUBSTR_L})").alias("win")
    return _substring_windows(docs, win)


@register("dedup_substring_windows_hashed", ORACLES["dedup_substring_windows"])
def dedup_substring_windows_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of dedup_substring_windows (VERDICT r4 #4):
    identical flags, but the exchange key is xxhash64(window) — an
    8-byte key instead of the raw {_SUBSTR_L}-char string, ~4× fewer
    shuffle bytes on the corpus-sized exchange (Lee et al.'s method is
    hash-based anyway).  The string variant stays registered as the
    oracle twin; THIS query shares its DuckDB oracle because the output
    (per-doc counts + flag) never exposes the key — a 64-bit collision
    over the corpus would be the only divergence (expected at ~2³²
    windows; none at any fixture).  Plan-tested: the exchanges carry the
    hashed key (tests/test_plans.py)."""
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    win_h = F.expr(f"xxhash64(substring(text, i, {_SUBSTR_L}))").alias("win_h")
    return _substring_windows(docs, win_h)


_MIX_BUDGET = 100_000  # token budget to allocate across languages


@register(
    "corpus_mix_allocation",
    f"""
WITH t AS (SELECT lang, count(*) AS n_docs,
                  CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
           FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS T FROM t),
a AS (SELECT lang, n_docs, n_tokens,
             ({_MIX_BUDGET} * n_tokens) // T AS base,
             ({_MIX_BUDGET} * n_tokens) % T AS rem
      FROM t, tot),
s AS (SELECT CAST(SUM(base) AS BIGINT) AS S FROM a),
r AS (SELECT a.*, row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM a)
SELECT lang, n_docs, n_tokens,
       CAST(base + CASE WHEN rk <= {_MIX_BUDGET} - s.S THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_tokens
FROM r, s
""",
)
def corpus_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture budgeting: allocate a fixed token budget across
    languages proportionally to their corpus mass using the
    largest-remainder (Hamilton) method — all-integer, so the allocation
    is exact (Σ alloc == budget, pytest-pinned) and the oracle compare is
    exact.  This is the 'mixture weights → per-source token quotas' step
    of a training-data pipeline, run here at the language granularity.

    Scale shape: one map-side-combined groupBy(lang); everything after
    operates on #langs rows (a window over a handful of rows), so the
    plan is a single corpus aggregation regardless of corpus size."""
    from pyspark.sql import Window

    from filter_vectordb_spark.functions.text import token_count
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    t = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("long").alias("n_tokens"),
    )
    tot = t.agg(F.sum("n_tokens").cast("long").alias("T"))
    a = t.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.expr(f"({_MIX_BUDGET} * n_tokens) DIV T").alias("base"),
        F.expr(f"({_MIX_BUDGET} * n_tokens) % T").alias("rem"),
    )
    s = a.agg(F.sum("base").cast("long").alias("S"))
    w = Window.orderBy(F.col("rem").desc(), F.col("lang"))
    r = a.withColumn("rk", F.row_number().over(w))
    return r.crossJoin(F.broadcast(s)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (
            F.col("base")
            + F.when(F.col("rk") <= _MIX_BUDGET - F.col("S"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    )


# PII redaction patterns — RE2-compatible so Spark (Java regex) and DuckDB
# (RE2) match identically; applied email → ip → phone on both sides.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
_PII_PHONE = r"\+1-555-\d{4}"


@register(
    "pii_scrub",
    f"""
WITH p AS (SELECT doc_id,
  text || ' contact user' || doc_id || '@example.com at 10.' || (doc_id % 256)
       || '.0.' || (doc_id % 100) || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
  AS raw FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(raw,
         '{_PII_EMAIL}', '<EMAIL>', 'g'),
         '{_PII_IP}', '<IP>', 'g'),
         '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}'))
          + len(regexp_extract_all(raw, '{_PII_IP}'))
          + len(regexp_extract_all(raw, '{_PII_PHONE}')) AS BIGINT) AS n_redactions
FROM p
""",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, IPv4, NANP-style phones) — the scrub pass a
    training-data pipeline runs before tokenization.  The fixture corpus
    carries no PII, so the query plants deterministic synthetic PII from
    doc_id with the SAME expression on both engines, then redacts it —
    the redaction machinery (RE2-compatible patterns, fixed application
    order, per-doc redaction counts) is what the oracle verifies.

    Pure regexp expressions per row — codegen'd, no shuffle, no Python —
    so the scrub runs at scan speed at any corpus size."""
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    p = docs.select("doc_id", raw.alias("raw"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), _PII_EMAIL, "<EMAIL>"),
            _PII_IP,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    n_red = (
        F.regexp_count(F.col("raw"), F.lit(_PII_EMAIL))
        + F.regexp_count(F.col("raw"), F.lit(_PII_IP))
        + F.regexp_count(F.col("raw"), F.lit(_PII_PHONE))
    ).cast("long")
    return p.select(
        "doc_id", scrubbed.alias("scrubbed"), n_red.alias("n_redactions")
    )


_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "token_stats_bpe",
    f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_pieces,
       len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS n_uniq_pieces
FROM documents
""",
)
def token_stats_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (letters / digit runs / punctuation as
    separate pieces) — the subword-style counterpart of whitespace
    token_stats; identical regex semantics on both engines."""
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    pieces = F.expr(f"regexp_extract_all(text, '{_BPE_RE}', 0)")
    return docs.select(
        "doc_id",
        F.size(pieces).alias("n_pieces"),
        F.size(F.array_distinct(pieces)).alias("n_uniq_pieces"),
    )


@register(
    "lang_id_ngram",
    """
WITH g AS (
  SELECT DISTINCT doc_id, lang, substr(lower(text), CAST(j + 1 AS INT), 3) AS trigram
  FROM documents, unnest(range(length(text) - 2)) t(j)
),
cnt AS (SELECT lang, trigram, count(*) AS c FROM g GROUP BY 1, 2),
prof AS (
  SELECT lang, trigram,
         200 - row_number() OVER (PARTITION BY lang ORDER BY c DESC, trigram) AS weight
  FROM cnt
  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, trigram) <= 200
),
sc AS (
  SELECT g.doc_id, prof.lang, CAST(sum(prof.weight) AS BIGINT) AS score
  FROM (SELECT DISTINCT doc_id, trigram FROM g) g
  JOIN prof USING (trigram) GROUP BY 1, 2
)
SELECT doc_id, lang AS lang_pred, score FROM sc
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) = 1
""",
)
def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID: profile training is model FIT (the
    profile table is the index — built once per sf_dir, ~langs×200 rows),
    prediction explodes the corpus once and broadcast-joins the profiles.
    Deterministic; accuracy is meaningful only on real multilingual data,
    so the driver check is rows-only."""
    from filter_vectordb_spark.operators.text_analysis import (
        predict_lang,
        train_lang_profiles,
    )
    from filter_vectordb_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    out = _index_cache_dir(sf_dir, "langprof")
    if not _is_built(out):
        train_lang_profiles(docs).write.mode("overwrite").parquet(out)
    return predict_lang(docs, spark.read.parquet(out))


