from go_bqloader_spark.streaming.pipeline import (  # noqa: F401
    run_cdc_stream,
    start_cdc_stream,
)
