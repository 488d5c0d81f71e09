"""Sources & sinks (SURVEY §2.1) + incremental state (SURVEY §2.9)."""

from dissertation_data_pipeline_spark.sources.io import (  # noqa: F401
    read_csv,
    read_jsonl,
    read_parquet,
    read_excel,
    read_json_zip,
    read_keywords,
    read_text_dir,
    write_table,
    write_jsonl,
    write_report,
)
from dissertation_data_pipeline_spark.sources.state import (  # noqa: F401
    StateTable,
    filter_unprocessed,
    content_changed,
)
