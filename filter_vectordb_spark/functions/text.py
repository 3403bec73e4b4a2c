"""Text-analysis kernels for LLM-data-pipeline operators.

These extend the reference's surface (SURVEY.md §7 P7 north-star
extensions): token statistics, quality scoring, document fingerprinting,
shingling, and a portable string hash.  Everything here is a pure Spark
SQL expression (JVM-side, codegen'd) built so the DuckDB oracle can
recompute identical values:

  char_hash: left-to-right polynomial fold  h = (h*131 + ascii(c)) mod p
             with p = 2^31−1 — folds fit in int64 (h < 2^31, ×131 + 255
             < 2^39), and both engines fold sequentially.

No library tokenizers: tokenization is whitespace splitting, the same
`string_split` semantics on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
HASH_MULT = 131


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def char_hash(s: Column) -> Column:
    """Polynomial rolling hash of a string (see module doc)."""
    chars = F.filter(F.split(s, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * HASH_MULT + F.ascii(c)) % HASH_P,
    )


def duckdb_char_hash_sql(expr: str) -> str:
    """The identical hash as DuckDB SQL."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform("
        f"list_filter(string_split({expr}, ''), c -> c <> ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), (a, c) -> (a * {HASH_MULT} + c) % {HASH_P})"
    )


def doc_fingerprint(text: Column) -> Column:
    """Whole-document rolling hash — the exact-duplicate fingerprint."""
    return char_hash(text)


def shingles_of_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a PRE-MATERIALIZED token array.

    Always project the token array into its own column first — referencing
    `tokens(text)` inside the lambda would re-split the text for every
    element access (O(len²) per row).
    """
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(grams)


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (ARRAY<STRING>) — the unit of
    near-dup similarity.  Prefer shingles_of_tokens over a materialized
    token column in hot paths (see its docstring)."""
    return shingles_of_tokens(tokens(text), n)


def duckdb_shingles_sql(text_expr: str, n: int = 3) -> str:
    """Identical shingling as DuckDB SQL (1-based list indexing)."""
    parts = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return (
        f"list_distinct([{parts} for i in range(1, "
        f"len(t) - {n - 1} + 1)])"
    )


# Stopwords: the corpus articles/fillers (fixture vocabulary is a small
# synthetic word set; 'the'/'a' function as stopwords in it).
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def uniq_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*STOPWORDS)))


def quality_flags(text: Column, n_chars: Column) -> dict[str, Column]:
    """Integer quality heuristics (Gopher/C4-style rules, integerized so
    the oracle compare is exact):
      len_ok        5 ≤ tokens ≤ 1000
      diversity_ok  distinct/total tokens ≥ 1/4 (integer cross-multiply)
      stopword_ok   at least one stopword (natural-language signal)
      chars_ok      n_chars within [20, 10000]
    """
    nt = token_count(text)
    nu = uniq_token_count(text)
    sw = stopword_count(text)
    return {
        "n_tokens": nt,
        "n_uniq_tokens": nu,
        "n_stopwords": sw,
        "len_ok": (nt >= 5) & (nt <= 1000),
        "diversity_ok": nu * 4 >= nt,
        "stopword_ok": sw > 0,
        "chars_ok": (n_chars >= 20) & (n_chars <= 10000),
    }


def quality_score(text: Column, n_chars: Column) -> Column:
    """0-4 integer score: the number of passed quality gates."""
    fl = quality_flags(text, n_chars)
    return (
        fl["len_ok"].cast("int")
        + fl["diversity_ok"].cast("int")
        + fl["stopword_ok"].cast("int")
        + fl["chars_ok"].cast("int")
    )


def ngrams_of_tokens(toks: Column, n: int) -> Column:
    """Word n-grams WITH duplicates (repetition is the signal — contrast
    shingles_of_tokens, which dedups for similarity).  Empty array when
    the document has fewer than n tokens (F.sequence would count DOWN for
    a negative span, so the short case must be guarded)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def duckdb_ngrams_sql(toks_expr: str, n: int) -> str:
    """Identical n-grams (with duplicates) as DuckDB SQL — range() yields
    an empty list for short docs, matching the guarded Spark side."""
    parts = " || ' ' || ".join(f"{toks_expr}[i + {j}]" for j in range(n))
    return f"[{parts} for i in range(1, len({toks_expr}) - {n - 1} + 1)]"


def top_token_count(toks: Column) -> Column:
    """Occurrences of the most frequent token — an O(distinct·n) codegen
    expression per row, no shuffle (Gopher's top-word repetition gate
    needs only this count, not the full histogram).  0 for empty docs."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda w: F.size(F.filter(toks, lambda x: x == w)),
            )
        ),
        F.lit(0),
    )
