"""Dataset sources beyond the parquet/JSONL transcripts reader:
file-granularity ingestion of raw document payloads."""

from .pdf_files import extract_pdf_dir, read_pdf_files  # noqa: F401
