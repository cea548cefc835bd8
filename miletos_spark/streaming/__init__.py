from miletos_spark.streaming.stateful import stream_trigger_clusters
from miletos_spark.streaming.ingest import (
    incremental_analysis,
    stream_rebin,
    stream_sessions,
)

__all__ = ["stream_sessions", "stream_rebin", "incremental_analysis", "stream_trigger_clusters"]
