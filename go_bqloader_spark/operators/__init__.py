from go_bqloader_spark.operators.merge import (  # noqa: F401
    lww_dedup,
    salted_lww_dedup,
)
