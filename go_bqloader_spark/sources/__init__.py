from go_bqloader_spark.sources.datagen import (  # noqa: F401
    CHANGE_SCHEMA,
    expected_final_state,
    gen_changes,
)
