"""Span explode / reassemble for interleaved documents (driver input_hint).

``explode_spans`` is fully vectorized with pyarrow list offsets — no Python
per-row loop: the list column's flattened child arrays become columns of the
exploded table, and ``list_parent_indices`` replicates doc_id.

The per-row invariant (span sequence equality: kind, text, media_ref, order —
BASELINE.json input_hint) is checked by ``span_signature`` /
``reassemble_spans`` round-trips in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def explode_batch(batch: pa.Table) -> pa.Table:
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_ids = pc.take(batch["doc_id"], parent)
    # per-doc span ordinal: running index minus each doc's list offset
    offsets = spans.offsets
    starts = pc.take(offsets, parent)
    ordinal = pc.subtract(pa.array(np.arange(len(flat), dtype=np.int64)),
                          pc.cast(starts, pa.int64()))
    return pa.table({
        "doc_id": doc_ids,
        "span_idx": ordinal,
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    })


def explode_spans(ds: rd.Dataset, batch_size: int = 4096) -> rd.Dataset:
    """documents(doc_id, spans) → one row per span, order-preserving."""
    return ds.map_batches(explode_batch, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)


def media_refs(ds: rd.Dataset) -> rd.Dataset:
    """Exploded spans filtered to media rows (vectorized Arrow filter)."""
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "media")),
        batch_format="pyarrow", zero_copy_batch=True)


def text_spans(ds: rd.Dataset) -> rd.Dataset:
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "text")),
        batch_format="pyarrow", zero_copy_batch=True)


def span_signature(batch: pa.Table) -> pa.Table:
    """Per-doc span-sequence signature (kind|text|media_ref joined in order) —
    the invariant gate: any document-level transform must preserve it."""
    joined = []
    for spans in batch["spans"].to_pylist():
        joined.append("\x1f".join(f"{s['kind']}\x1e{s['text']}\x1e{s['media_ref']}" for s in spans))
    return pa.table({"doc_id": batch["doc_id"], "signature": pa.array(joined, pa.string())})


def reassemble_spans(exploded: pa.Table) -> pa.Table:
    """Group exploded spans back into documents, ordered by span_idx —
    the inverse of explode (used by the round-trip invariant test)."""

    df = exploded.to_pandas().sort_values(["doc_id", "span_idx"])
    out = (
        df.groupby("doc_id", sort=True)
        .apply(lambda g: [
            {"kind": k, "text": t, "media_ref": m, "offset": int(o)}
            for k, t, m, o in zip(g["kind"], g["text"], g["media_ref"], g["offset"])
        ], include_groups=False)
        .reset_index(name="spans")
    )
    return pa.Table.from_pandas(out, preserve_index=False)
