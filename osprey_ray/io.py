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


TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.large_string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def read_transcripts_jsonl(path: str) -> "rd.Dataset":
    """JSONL transcript source — the reference ingests action events as
    JSON payloads from its queue (osprey_coordinator/src/consumer/
    kafka.rs), so a JSON-lines ingest path is the parity surface for
    users whose upstream emits JSON rather than Parquet.

    Arrow's native JSON reader parses each block straight into the
    canonical transcript schema (int32 turn_idx, timestamp[us] ts from
    ISO-8601 strings) inside the read tasks — vectorized, no Python-row
    decode — and a trailing cast pins large_string for ``text`` (the
    JSON parser materializes string; the cast is zero-copy for the
    offsets upgrade).  Unexpected fields error loudly rather than being
    dropped silently."""
    from pyarrow import json as pajson

    parse_schema = pa.schema(
        [
            f if f.name != "text" else pa.field("text", pa.string())
            for f in TRANSCRIPT_SCHEMA
        ]
    )
    ds = rd.read_json(
        path,
        parse_options=pajson.ParseOptions(
            explicit_schema=parse_schema, unexpected_field_behavior="error"
        ),
    )
    return ds.map_batches(
        lambda t: t.cast(TRANSCRIPT_SCHEMA), batch_format="pyarrow"
    )
