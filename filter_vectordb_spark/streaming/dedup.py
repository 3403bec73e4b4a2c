"""Streaming deduplication — arrival-time dup links over a document stream.

A training-data ingest pipeline dedups continuously: each arriving
document is checked against everything already admitted, and either
becomes the canonical copy of its content or is linked to the earlier
one.  Batch dedup (operators/dedup.py) answers "which docs are dups" over
a closed corpus; this operator answers it over an open stream, keeping
per-content-key state across microbatches.

Plan shape (all stream-native, no driver collection):

  readStream(documents) → project (doc_id, group_key)        [stateless,
      group_key = the SAME normalized-content hash as exact_dedup:
      char_hash of the sorted distinct token set]
  → groupBy(group_key).applyInPandasWithState                [keyed state:
      first_id = lowest doc_id admitted so far for this key]
  → emit one link row (doc_id, group_key, first_id) per non-canonical doc

Within a microbatch, rows of a key are processed in doc_id order; a doc
is canonical iff it carries the lowest id seen so far.  If a later batch
delivers a smaller id than the standing canonical (out-of-order
arrival), the old canonical is demoted — emitted as a link to the new
first — so the final link set always points at the per-key minimum that
has arrived.  Links already emitted in earlier batches are NOT
retracted (streams can't unsay); consumers that need the transitive
canonical follow the chain (old_first → new_first), exactly the
union-find contract of the batch cluster op (operators/dedup.py).

Scale posture (100 TB ingest): state is one (key → first_id) entry per
distinct content key, hash-partitioned across executors by the stream's
keyed-state shuffle; each microbatch moves only its own rows plus one
state row per touched key.  The fixture replay (one parquet = one
microbatch) makes arrival order = id order, so the emitted links equal
the batch oracle: every doc except the per-key min, linked directly to
that min.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from filter_vectordb_spark.functions.text import char_hash, tokens

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

OUTPUT_SCHEMA = "doc_id BIGINT, group_key BIGINT, first_id BIGINT"
STATE_SCHEMA = "first_id BIGINT"


def read_documents_stream(
    spark: SparkSession, sf_dir: str, glob: str = "documents.parquet"
) -> DataFrame:
    """File-source stream of the documents table (one parquet = one
    microbatch locally; a Kafka/files drip on a cluster).  Widen `glob`
    when the source directory drips multiple files."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", glob)
        .load(sf_dir)
    )


def _link_dups(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (first,) = state.get if state.exists else (None,)
    out_doc, out_first = [], []
    for pdf in pdfs:
        for doc_id in sorted(pdf["doc_id"].astype(int)):
            if first is None:
                first = doc_id
            elif doc_id < first:
                # out-of-order arrival: demote the standing canonical
                out_doc.append(first)
                out_first.append(doc_id)
                first = doc_id
            else:
                out_doc.append(doc_id)
                out_first.append(first)
    state.update((int(first),))
    yield pd.DataFrame(
        {
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "group_key": pd.Series([key[0]] * len(out_doc), dtype="int64"),
            "first_id": pd.Series(out_first, dtype="int64"),
        }
    )


def dedup_links_stream(docs: DataFrame) -> DataFrame:
    """documents stream → (doc_id, group_key, first_id) link stream."""
    keyed = docs.select(
        "doc_id",
        char_hash(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))
        ).alias("group_key"),
    )
    return keyed.groupBy("group_key").applyInPandasWithState(
        _link_dups,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_links_to_memory(
    spark: SparkSession, sf_dir: str, query_name: str = "streaming_dedup"
) -> DataFrame:
    """Drive the link stream over the fixture synchronously; links are
    append-only facts, so the memory-sink table is the result directly.

    State partitions: each streaming state partition pays per-microbatch
    store maintenance, so the local runner uses 8 (fresh temp checkpoint
    per run — the partition count bakes into a checkpoint, which is why
    this is set here and not globally); a cluster deployment sizes it to
    the key cardinality instead."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = dedup_links_stream(read_documents_stream(spark, sf_dir))
        q = (
            stream.writeStream.outputMode("update")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")
