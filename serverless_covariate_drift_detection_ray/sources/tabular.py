"""Multi-format tabular sources: parquet / CSV / JSONL behind one reader.

The engine's canonical storage is parquet (column pruning + row-group
predicate pushdown), but ingest pipelines also land CSV and JSONL drops.
``read_table`` dispatches on format and normalizes the weakly-typed text
formats to a target Arrow schema INSIDE the read tasks (a streaming
``map_batches`` cast, not a driver-side rewrite), so every downstream stage
sees one schema regardless of the wire format.

Scale notes: CSV/JSON readers shard by file and by block just like parquet,
but carry no column statistics — `columns=` pruning happens post-parse, so
parquet remains the recommended at-rest format; these readers exist for the
ingest edge. Timestamps in CSV/JSONL are ISO-8601 strings and are cast to
``timestamp[us]`` during normalization.
"""

from __future__ import annotations

import pyarrow as pa


def _normalize(target: pa.Schema):
    """Streaming cast of a parsed text-format batch onto ``target``:
    select/reorder the target's columns and cast each to the target type
    (ISO-8601 strings → timestamp, int widths, etc.)."""

    def cast(batch: pa.Table) -> pa.Table:
        cols = {}
        for f in target:
            if f.name not in batch.column_names:
                # schema evolution: a JSONL row omitting an optional field
                # (absent key, standard JSON practice) or a CSV file landed
                # before a column existed null-fills, mirroring the
                # fragmented reader's pre-column-fragment semantics
                cols[f.name] = pa.nulls(batch.num_rows, f.type)
                continue
            col = batch[f.name]
            if not col.type.equals(f.type):
                # Arrow casts ISO-8601 strings -> timestamp natively; other
                # mismatches (int widths, float32 CSV reads) cast the same way
                col = col.cast(f.type)
            cols[f.name] = col
        return pa.table(cols)

    return cast


def read_table(path: str, fmt: str = "parquet",
               columns: list[str] | None = None,
               schema: pa.Schema | None = None):
    """Read ``path`` as a Ray Dataset in the given format.

    parquet: native pruned read (``columns`` pushed to the scan).
    csv / jsonl: sharded text read, then a streaming normalization cast to
    ``schema`` (required — text formats are weakly typed) and a post-parse
    column selection.
    """
    import ray.data

    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns)
    if fmt not in ("csv", "jsonl"):
        raise ValueError(f"unsupported table format: {fmt!r}")
    if schema is None:
        raise ValueError("csv/jsonl reads need a target schema to normalize to")
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    ds = (ray.data.read_csv(path) if fmt == "csv"
          else ray.data.read_json(path))
    return ds.map_batches(_normalize(schema), batch_format="pyarrow",
                          zero_copy_batch=True)


def write_table(ds, path: str, fmt: str = "parquet") -> None:
    """Write a Dataset as partitioned files (one per block — resumable and
    re-shardable; never one giant file)."""
    if fmt == "parquet":
        ds.write_parquet(path)
    elif fmt == "csv":
        ds.write_csv(path)
    elif fmt == "jsonl":
        ds.write_json(path)
    else:
        raise ValueError(f"unsupported table format: {fmt!r}")
