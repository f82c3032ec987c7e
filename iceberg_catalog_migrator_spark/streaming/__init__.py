from .jobs import (
    cdc_latest_state_stream,
    click_purchase_join_stream,
    document_ingest_stream,
    documents_stream,
    events_stream,
    hourly_counts_stream,
    prepare_documents_stream_input,
    run_stream_to_memory,
    session_window_stream,
    stateful_user_counter_stream,
    stream_dedup,
    write_stream_idempotent_parquet,
)

__all__ = [
    "cdc_latest_state_stream",
    "click_purchase_join_stream",
    "document_ingest_stream",
    "documents_stream",
    "events_stream",
    "hourly_counts_stream",
    "prepare_documents_stream_input",
    "run_stream_to_memory",
    "session_window_stream",
    "stateful_user_counter_stream",
    "stream_dedup",
    "write_stream_idempotent_parquet",
]
