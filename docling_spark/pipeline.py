"""End-to-end extraction pipeline (SURVEY.md §3, §7).

Spark plan
----------
Every stage (sniff → HTML/PDF normalize → hierarchy state machine) is
document-local, so the whole pipeline compiles to **one narrow mapInArrow
stage over the scan: zero shuffles** (per the input_hint contract:
vectorized pandas/Arrow UDFs only — Arrow-native marshaling is the faster
half of that contract; the mapInPandas form is kept equivalence-tested).
At 100 TB that means:

- parallelism = input splits (`spark.sql.files.maxPartitionBytes`), no
  exchange, no skewed reducer;
- column pruning at the parquet/Iceberg scan (we only read doc_id + spans);
- skew inside a split (one mega-doc) is bounded by the Arrow batch size
  (`spark.sql.execution.arrow.maxRecordsPerBatch`) — a giant document ships
  alone in its batch instead of stalling a reducer, and `rebalance()` offers
  an explicit weight-aware repartition when input files are pathological.

The per-document logic is pure Python over one doc's spans (the reference's
own design: single-pass O(n), sequential_parser.py:5-15); the vectorization
axis is documents-per-Arrow-batch, per the input_hint contract (vectorized
pandas/Arrow UDFs, no per-row Python UDFs in the plan).
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Tuple

import pandas as pd

from docling_spark.operators import sniff
from docling_spark.operators.hierarchy import reconstruct
from docling_spark.operators.html_extract import extract_html_spans
from docling_spark.operators.pdf_extract import normalize_pdf_spans
from docling_spark.schema import DOC_DDL

Span = Tuple[str, str, Optional[str]]


def _as_tuples(raw_spans) -> List[Span]:
    """Arrow hands array<struct> to pandas as a sequence of dicts (or None)."""
    out: List[Span] = []
    if raw_spans is None:
        return out
    for s in raw_spans:
        if s is None:
            continue
        if isinstance(s, dict):
            out.append((s.get("kind") or "", s.get("text") or "", s.get("media_ref")))
        else:  # tuple/Row-like: (kind, text, media_ref[, offset])
            out.append((s[0] or "", s[1] or "", s[2]))
    return out


def extract_document(raw_spans, emit_page_breaks: bool = False) -> List[Span]:
    """Sniff one document and run the matching normalization path.

    `emit_page_breaks=True` threads the PDF path's page boundaries into the
    span stream as 'page_break' spans (see normalize_pdf_spans), which
    `markdown_sink(page_break_placeholder=...)` renders like docling-core's
    MarkdownParams.page_break_placeholder. Default False keeps the
    span-sequence contract unchanged (HTML/stream sources carry no page
    provenance, matching the reference where only paginated sources emit
    page-break nodes)."""
    spans = _as_tuples(raw_spans)
    fmt = sniff.sniff_doc(spans)
    if fmt == sniff.HTML:
        flat: List[Span] = []
        for kind, text, ref in spans:
            if kind == "html_bytes":
                flat.extend(extract_html_spans(text))
            else:
                flat.append((kind, text, ref))
        return reconstruct(flat)
    if fmt == sniff.PDF_LIKE:
        return normalize_pdf_spans(spans, emit_page_breaks=emit_page_breaks)
    # docling stream (or unknown → treated as pre-parsed stream)
    return reconstruct(spans)


def extract_document_safe(raw_spans) -> List[Span]:
    """Per-document fault isolation: at 10^12 docs one malformed document
    must not fail its whole task/partition — it emits a single `error` span
    (kind in the closed set, surfaced by the kind-histogram metrics and
    trivially filterable downstream) and the batch continues. The bucket
    lineage keeps the doc re-processable after a fix."""
    try:
        return extract_document(raw_spans)
    except Exception as exc:  # noqa: BLE001 — the isolation boundary
        return [("error", f"{type(exc).__name__}: {exc}"[:500], None)]


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out_spans = []
    for raw in pdf["spans"]:
        normalized = extract_document_safe(raw)
        out_spans.append(
            [
                {"kind": k, "text": t, "media_ref": r, "offset": i}
                for i, (k, t, r) in enumerate(normalized)
            ]
        )
    result = pd.DataFrame({"doc_id": pdf["doc_id"].values, "spans": out_spans})
    for extra in pdf.columns:
        if extra not in ("doc_id", "spans"):
            result[extra] = pdf[extra].values
    return result


def extract_html_formatted(df):
    """HTML documents → the flat formatted span stream:
    (doc_id, spans, fmt) where `spans` keeps the BASELINE 4-field shape and
    `fmt: array<string>` carries index-aligned inline-formatting flags
    (⊆ "BIUS"; hyperlinks ride media_ref as usual). Feeds the
    formatting-aware sinks — `markdown_sink`/`html_sink` detect the `fmt`
    column and render those spans under docling-core's serializer rules
    (bold/italic/strikethrough/hyperlink + escaping).

    Flat stream by design: the hierarchy state machine merges spans, which
    collapses per-item formatting (docling has the same per-TextItem
    granularity — document.py:1617-1639). Same narrow zero-shuffle
    mapInPandas shape as `extract`. Non-HTML span kinds pass through with
    empty flags."""
    schema = DOC_DDL + ", fmt array<string>"

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out_spans, out_fmt = [], []
            for raw in pdf["spans"]:
                flat: List[tuple] = []
                for kind, text, ref in _as_tuples(raw):
                    if kind == "html_bytes":
                        flat.extend(extract_html_spans(text, with_formatting=True))
                    else:
                        flat.append((kind, text, ref, ""))
                out_spans.append(
                    [
                        {"kind": k, "text": t, "media_ref": r, "offset": i}
                        for i, (k, t, r, _f) in enumerate(flat)
                    ]
                )
                out_fmt.append([f for (_k, _t, _r, f) in flat])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "spans": out_spans, "fmt": out_fmt}
            )

    return df.mapInPandas(gen, schema=schema)


def extract_pandas(df, extra_cols: str = ""):
    """mapInPandas form of the extraction stage (kept for the arrow≡pandas
    equivalence test; `extract` below is the production path)."""
    schema = DOC_DDL + extra_cols

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf)

    return df.mapInPandas(gen, schema=schema)


def _extract_record_batch(rb, declared_extra=None):
    """One Arrow RecordBatch of documents → one normalized RecordBatch.

    Bulk columnar marshaling: the span struct's child arrays convert to
    Python lists in three vectorized calls (no per-row dict materialization
    — the pandas path builds a dict per span, which at ~130 output spans/doc
    dominated worker CPU), per-doc slices are zipped into the tuples the
    state machine consumes, and the output is assembled as flat arrays +
    list offsets."""
    import pyarrow as pa
    import pyarrow.compute as pc

    names = rb.schema.names
    la = rb.column(names.index("spans"))
    lengths = pc.list_value_length(la).to_pylist()
    vals = la.flatten()  # logical concatenation in row order
    kinds = vals.field("kind").to_pylist()
    texts = vals.field("text").to_pylist()
    refs = vals.field("media_ref").to_pylist()

    out_k: List[str] = []
    out_t: List[str] = []
    out_r: List[Optional[str]] = []
    out_o: List[int] = []
    offsets = [0]
    lo = 0
    for length in lengths:
        length = length or 0
        hi = lo + length
        normalized = extract_document_safe(list(zip(kinds[lo:hi], texts[lo:hi], refs[lo:hi])))
        lo = hi
        for j, (k, t, r) in enumerate(normalized):
            out_k.append(k)
            out_t.append(t)
            out_r.append(r)
            out_o.append(j)
        offsets.append(len(out_k))

    struct = pa.StructArray.from_arrays(
        [
            pa.array(out_k, pa.string()),
            pa.array(out_t, pa.string()),
            pa.array(out_r, pa.string()),
            pa.array(out_o, pa.int32()),
        ],
        ["kind", "text", "media_ref", "offset"],
    )
    out_spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    # emit in declared-schema order: doc_id, spans, then passthrough columns
    # ordered by the DECLARED extra-col names (mapInArrow binds positionally;
    # emitting in input-batch order would silently mislabel a caller whose
    # column order differs from its extra_cols string)
    arrays = [rb.column(names.index("doc_id")), out_spans]
    out_names = ["doc_id", "spans"]
    extra_names = (
        declared_extra
        if declared_extra is not None
        else [n for n in names if n not in ("doc_id", "spans")]
    )
    for name in extra_names:
        if name not in names:
            raise ValueError(
                f"extra_cols declares {name!r} but the input batch has {names}"
            )
        arrays.append(rb.column(names.index(name)))
        out_names.append(name)
    return pa.RecordBatch.from_arrays(arrays, out_names)


def extract(df, extra_cols: str = ""):
    """documents(doc_id, spans[, extra]) → normalized documents, same shape.

    One narrow mapInArrow stage; `extra_cols` (e.g. ", bucket int") are
    passed through untouched so the checkpointed runner can keep its lineage
    column without a join. Arrow-native marshaling — see
    _extract_record_batch."""
    schema = DOC_DDL + extra_cols
    # Parse declared names with a real DDL parse — naive ','-splitting
    # mis-tokenizes parameterized types like ", price decimal(10,2)".
    if extra_cols.strip():
        from pyspark.sql.types import _parse_datatype_string

        extra_struct = _parse_datatype_string(
            f"struct<{extra_cols.strip().lstrip(',')}>"
        )
        declared_extra = [f.name for f in extra_struct.fields]
    else:
        declared_extra = []

    def gen(batches):
        for rb in batches:
            if rb.num_rows:
                yield _extract_record_batch(rb, declared_extra)

    return df.mapInArrow(gen, schema=schema)


def extract_full(df):
    """The full flagship path: extract (sniff → HTML/PDF normalize →
    hierarchy state machine) followed by J4 paragraph enrichment
    (operators.enrich — re-extracts embedded pismeno runs into synthetic
    odseks). Still one narrow zero-shuffle chain: mapInArrow → mapInPandas.
    Annex integration (J5) composes on top via
    sources.readers.integrate_annexes(extract_full(df), manifest) — it
    returns an audit table, not the span shape, so it stays a separate
    stage."""
    from docling_spark.operators.enrich import enrich

    return enrich(extract(df))


def rebalance(df, num_partitions: int):
    """Optional explicit skew mitigation: hash-repartition documents so
    pathological input files (one giant doc per split) spread across the
    cluster. Costs one shuffle — only worth it when input layout is bad,
    which is why it is not part of the default zero-shuffle plan."""
    from pyspark.sql import functions as F

    return df.repartition(num_partitions, F.xxhash64("doc_id"))
