from go_bqloader_spark.functions.transforms import (  # noqa: F401
    clean_number,
    normalize_date,
    normalize_date_compact,
    normalize_date_kanji,
    parse_era_date,
    payment_month_from_path,
)
from go_bqloader_spark.functions.webtext import (  # noqa: F401
    extract_text,
    make_html,
)
