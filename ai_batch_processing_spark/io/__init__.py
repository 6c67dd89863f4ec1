from ai_batch_processing_spark.io.readers import (
    IngestError,
    read_csv_strict,
    read_json_strict,
    read_table,
    read_txt_sniffed,
)
from ai_batch_processing_spark.io.writers import (
    export_projection,
    sanitize_group_expr,
    write_consolidated_csv,
    write_consolidated_json,
    write_individual_files,
)

__all__ = [
    "IngestError",
    "read_csv_strict",
    "read_json_strict",
    "read_table",
    "read_txt_sniffed",
    "export_projection",
    "sanitize_group_expr",
    "write_consolidated_csv",
    "write_consolidated_json",
    "write_individual_files",
]
