"""Dataset catalog — the reference's upload/registration surface (S1).

Reference: ``POST /upload`` validates extension + size, parses, and
registers the ONE live table in a module-level dict, clearing prior state
(main.py:78-115, 106-109). Here: any number of named datasets, each a
temp view over a validated read — multi-table is free on Spark, and the
one-table-at-a-time reset becomes an explicit :meth:`Catalog.reset`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ai_batch_processing_spark.io.readers import IngestError, read_table

ALLOWED_EXTENSIONS = (".csv", ".json", ".txt", ".parquet")  # main.py:82-84 + parquet
MAX_FILE_SIZE = 10 * 1024 * 1024  # main.py:24 — enforced only when requested;
# a 100 TB engine's default is NO size ceiling.


class Catalog:
    """Named datasets registered as temp views on one SparkSession."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._tables: dict[str, DataFrame] = {}

    def ingest(
        self,
        path: str,
        name: str | None = None,
        infer_types: bool = True,
        enforce_size_cap: bool = False,
    ) -> DataFrame:
        """Validate + read ``path`` and register it as ``name``.

        Extension gate mirrors main.py:82-84; the reference's 10 MB cap
        (main.py:87-89) is opt-in. Returns the registered DataFrame.
        """
        ext = os.path.splitext(path)[1].lower()
        if ext not in ALLOWED_EXTENSIONS:
            raise IngestError(
                f"Unsupported file format {ext!r}: use one of {', '.join(ALLOWED_EXTENSIONS)}"
            )
        if enforce_size_cap and os.path.getsize(path) > MAX_FILE_SIZE:
            raise IngestError(f"File too large: {os.path.getsize(path)} bytes > {MAX_FILE_SIZE}")
        name = name or os.path.splitext(os.path.basename(path))[0]
        df = read_table(self._spark, path, infer_types=infer_types)
        df.createOrReplaceTempView(name)
        self._tables[name] = df
        return df

    def get(self, name: str) -> DataFrame:
        return self._tables[name]

    def names(self) -> list[str]:
        return sorted(self._tables)

    def schema(self, name: str) -> list[str]:
        """Template variables for the UI layer (flask_template.html:798-799)."""
        return self._tables[name].columns

    def drop(self, name: str) -> None:
        self._spark.catalog.dropTempView(name)
        self._tables.pop(name, None)

    def reset(self) -> None:
        """/reset_system analog (main.py:671-677)."""
        for name in list(self._tables):
            self.drop(name)
