from filter_vectordb_spark.streaming.runbook import (  # noqa: F401
    Runbook,
    RunbookStep,
    StreamingReplayer,
    parse_runbook_yaml,
)
