"""Shared Parquet read helper.

``read_parquet_clean`` passes an explicit metadata-free schema to
``ray.data.read_parquet``: pyarrow 16's ``pa.Schema`` is unhashable when it
carries (pandas) key-value metadata, which makes Ray Data's schema
deduplication log "Failed to hash the schemas … unhashable type: 'dict'"
in every worker for every metadata-bearing file.  Stripping the metadata at
the read silences the noise and costs nothing (the engine never reads the
pandas metadata)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def read_parquet_clean(path: str, columns: list[str] | None = None) -> "rd.Dataset":
    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=sch)
