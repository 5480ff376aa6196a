"""Document-corpus file I/O for the LLM-pipeline surface: JSONL in/out.

Web-crawl corpora ship as JSON-lines (one document object per line,
usually gzipped). Spark's json source handles this natively — including
transparent ``.gz`` decompression, schema enforcement, and partitioned
parallel reads — so these helpers only pin the contract that makes a
100 TB ingest safe:

- **Explicit schema, never inference.** Schema inference runs a full
  extra pass over the corpus and silently widens types from whatever the
  first files happen to contain; a 100 TB read must declare its schema.
- **PERMISSIVE with a visible corrupt-record column.** Crawl dumps
  always contain some malformed lines; failing the whole job
  (FAILFAST) or silently dropping them (DROPMALFORMED) are both wrong
  for provenance-tracked pipelines. Bad lines surface as rows whose
  ``_corrupt_record`` carries the raw line, and ``split_corrupt``
  separates them for quarantine.
- One shuffle-free path: read → gate → write is map-only unless the
  caller adds shuffling transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default document schema (mirrors the driver's documents table) plus
#: the corrupt-record capture column
DOCS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
CORRUPT_COL = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCS_JSONL_SCHEMA,
) -> DataFrame:
    """Read a JSONL document corpus with an explicit schema; malformed
    lines become rows with all schema fields null and the raw line in
    ``_corrupt_record`` (PERMISSIVE mode). Accepts a file, directory, or
    glob; ``.gz`` parts decompress transparently (gz is not splittable —
    a 100 TB corpus should arrive as many parts, which is how crawl
    dumps ship anyway).

    Implemented as a text scan + ``from_json`` rather than the native
    json source: the native source forbids any downstream query whose
    pruned column set is only the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
    exactly what a quarantine ``count()`` prunes to. A text scan reads
    whole lines either way — JSON parsing cannot skip bytes — so this
    costs nothing, keeps everything lazy/single-pass, and Catalyst's
    OptimizeJsonExprs still prunes unused fields out of the parse.

    Blank / whitespace-only lines are dropped BEFORE parsing: crawl
    dumps routinely end with a trailing newline or carry empty separator
    lines, and ``from_json`` parses them to an all-null struct with a
    null ``_corrupt_record`` — i.e. a phantom "clean" document with no
    fields. They are not documents and not malformed JSON, so neither
    the clean nor the quarantine branch should count them (pinned by
    test_jsonl_blank_lines_are_not_documents).
    """
    parsed = F.from_json(
        "value",
        f"{schema}, {CORRUPT_COL} string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return (
        spark.read.text(path)
        .where(F.trim("value") != "")
        .select(parsed.alias("j"))
        .select("j.*")
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE jsonl read into (clean, quarantine): clean rows
    without the corrupt column; quarantine rows keeping the FULL row —
    any fields that did parse plus the raw line in ``_corrupt_record``
    for reprocessing. Both are pure filters over the same scan; the
    quarantine branch deliberately does NOT project down to the corrupt
    column alone, because Spark refuses raw-JSON queries that reference
    only the internal corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and the
    partially-parsed fields are provenance a quarantine wants anyway."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    return clean, bad


def write_documents_jsonl(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
    compression: str | None = "gzip",
) -> None:
    """Write a document frame as JSONL parts. ``max_records_per_file``
    bounds part size (the writer-side analogue of the reference's Excel
    sheet split, backend/io.py:22) so downstream single-threaded
    consumers never face one giant part; compression defaults to gzip to
    match how crawl corpora ship."""
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    w.json(path)
