from sparkstreamingtwitter_presidential_spark.streaming.collector import run_bounded_collector
from sparkstreamingtwitter_presidential_spark.streaming.dedup import streaming_exact_dedup
from sparkstreamingtwitter_presidential_spark.streaming.delta_sink import (
    delta_batch_committer,
    write_stream_to_delta,
)
from sparkstreamingtwitter_presidential_spark.streaming.delta_upsert import (
    delta_upsert_committer,
    upsert_stream_to_delta,
)
from sparkstreamingtwitter_presidential_spark.streaming.hudi_sink import (
    hudi_batch_committer,
    hudi_upsert_committer,
    upsert_stream_to_hudi,
    write_stream_to_hudi,
)
from sparkstreamingtwitter_presidential_spark.streaming.iceberg_sink import (
    iceberg_batch_committer,
    iceberg_upsert_committer,
    upsert_stream_to_iceberg,
    write_stream_to_iceberg,
)
from sparkstreamingtwitter_presidential_spark.streaming.incremental import (
    drain_delta_incremental,
    run_delta_incremental,
)
from sparkstreamingtwitter_presidential_spark.streaming.joins import stream_stream_join
from sparkstreamingtwitter_presidential_spark.streaming.update_mode import (
    drain_update_mode,
    running_counts,
)
from sparkstreamingtwitter_presidential_spark.streaming.windows import (
    session_aggregate,
    sliding_aggregate,
    tumbling_aggregate,
)

__all__ = [
    "delta_batch_committer",
    "delta_upsert_committer",
    "drain_update_mode",
    "drain_delta_incremental",
    "hudi_batch_committer",
    "hudi_upsert_committer",
    "iceberg_batch_committer",
    "iceberg_upsert_committer",
    "run_bounded_collector",
    "run_delta_incremental",
    "running_counts",
    "session_aggregate",
    "sliding_aggregate",
    "stream_stream_join",
    "streaming_exact_dedup",
    "tumbling_aggregate",
    "upsert_stream_to_delta",
    "upsert_stream_to_hudi",
    "upsert_stream_to_iceberg",
    "write_stream_to_delta",
    "write_stream_to_hudi",
    "write_stream_to_iceberg",
]
