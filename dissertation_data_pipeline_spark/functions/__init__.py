"""Scalar expression library (SURVEY §2.8).

Every scalar the reference applies row-wise in Python is re-expressed here
as a pure ``Column -> Column`` builder over ``pyspark.sql.functions`` —
JVM-side, codegen-friendly, no Python UDFs in any of these paths.
"""

from dissertation_data_pipeline_spark.functions.missing import (  # noqa: F401
    is_missing,
    nullify_blank,
    coalesce_missing,
)
from dissertation_data_pipeline_spark.functions.text import (  # noqa: F401
    normalize_bill_number,
    bill_number_variants,
    normalize_status,
    decode_status_code,
    title_case,
    normalize_url,
    state_code,
    safe_filename,
    make_bill_id,
    normalize_text_plain,
    doc_id_from_url,
    word_count,
)
from dissertation_data_pipeline_spark.functions.dates import (  # noqa: F401
    lenient_year,
    parse_date_multi,
    year_from_prefix,
)
from dissertation_data_pipeline_spark.functions.arrays import (  # noqa: F401
    matched_keywords,
    keyword_filter_predicate,
    theme_tags,
    concat_text_columns,
    is_amendment,
)
