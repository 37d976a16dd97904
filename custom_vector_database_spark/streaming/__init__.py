from custom_vector_database_spark.streaming.stream_ops import (  # noqa: F401
    run_stream_to_memory,
    stream_purchase_click_join,
    stream_session_agg,
    stream_sliding_agg,
    stream_tumbling_agg,
    streaming_events,
)
