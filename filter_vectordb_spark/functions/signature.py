"""Bit-signature codec (SURVEY.md §2.6 K5, §2.2 F2).

The reference packs a 63-bit bloom-style tag signature: each tag gets a
reproducible random bit pattern (`RandomState(123)`, p=0.1 per bit),
per-doc signature = OR over its tags, and queries cheaply reject docs with
`q_mask & ~sig != 0` (`filter/faiss/faiss.py:97-124`,
`bow_id_selector.swig:107-130`).

We keep the semantics (reproducible per-tag pattern, OR fold, superset
mask test) but derive patterns with pure integer arithmetic instead of a
numpy RNG, so the DuckDB oracle can recompute the identical signature in
SQL.  Pattern: NBITS=3 positions per tag,

    pos_i(t) = (t*2654435761 + i*40503) % 63        (Knuth multiplicative hash)
    pattern(t) = OR_i (1 << pos_i(t))

All arithmetic in BIGINT; bit 63 is never set (matches the reference's
63-bit budget above the id bits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NBITS = 3
MULT = 2654435761
STEP = 40503
SIG_BITS = 63


def tag_pattern(tag: Column) -> Column:
    """63-bit pattern for one tag id (BIGINT column)."""
    t = tag.cast("long")
    pat = F.lit(0).cast("long")
    for i in range(NBITS):
        pos = (t * F.lit(MULT) + F.lit(i * STEP)) % F.lit(SIG_BITS)
        # F.shiftleft only takes a literal bit count; call_function passes a Column
        pat = pat.bitwiseOR(
            F.call_function("shiftleft", F.lit(1).cast("long"), pos.cast("int"))
        )
    return pat


def sig_from_tags(tags: Column) -> Column:
    """Per-doc signature: OR-fold of tag patterns (reference A4,
    `filter/faiss/faiss.py:50-61`)."""
    return F.aggregate(
        tags,
        F.lit(0).cast("long"),
        lambda acc, t: acc.bitwiseOR(tag_pattern(t)),
    )


def sig_matches(sig: Column, qmask: Column) -> Column:
    """Cheap pre-filter: doc may contain all query tags iff its signature
    is a superset of the query mask (`bow_id_selector.swig:122-127`).
    False positives possible (bloom), false negatives impossible."""
    return sig.bitwiseAND(qmask) == qmask


def duckdb_sig_sql(tags_expr: str) -> str:
    """The identical signature computation as DuckDB SQL (oracle side)."""
    pats = " | ".join(
        f"(1::BIGINT << CAST((t::BIGINT * {MULT} + {i * STEP}) % {SIG_BITS} AS INT))"
        for i in range(NBITS)
    )
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({tags_expr}, t -> {pats})), (a, b) -> a | b)"
    )
