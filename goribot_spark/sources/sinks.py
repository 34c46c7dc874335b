"""Item sinks — the reference's saver extensions as DataFrame writers.

SaveItemsAsJSON / SaveItemsAsCSV (extensions.go:26-86) append items to a
single file; the Spark forms write partitioned directories (the only shape
that scales) with the same content contract. SpiderLogError
(extensions.go:163-213) maps to the errors-table export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_items_json(items: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S10: results/items → JSON lines (binary columns hex-encoded: JSON has
    no binary type; the reference gob/json-encodes interface{} items)."""
    out = items
    for f in items.schema.fields:
        if f.dataType.typeName() == "binary":
            out = out.withColumn(f.name, F.hex(F.col(f.name)))
    out.write.mode(mode).json(path)


def save_items_csv(items: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11: flat columns → CSV with header (CsvItem []string analog)."""
    out = items
    for f in items.schema.fields:
        t = f.dataType.typeName()
        if t == "binary":
            out = out.withColumn(f.name, F.hex(F.col(f.name)))
        elif t in ("array", "map", "struct"):
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    out.write.mode(mode).option("header", True).csv(path)


def save_error_log(errors: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S12: formatted error dump (SpiderLogError analog) as JSON lines."""
    errors.orderBy("wave", "url").write.mode(mode).json(path)
