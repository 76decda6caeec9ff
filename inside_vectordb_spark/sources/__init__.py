"""Sources & sinks (SURVEY.md §2.1).

The reference's landed formats re-expressed as Spark readers/writers:

- JSONL corpus / queries (S2-S4, S6): ``files.read_corpus_jsonl``,
  ``read_queries_jsonl``, ``write_corpus_jsonl``
- qrels TSV (S5): ``files.read_qrels_tsv``, ``write_qrels_tsv``
- columnar embeddings (S7-S8, the NPZ analogue): ``files.
  write_embeddings_parquet``, ``read_embeddings_parquet``
- ORC tables (warehouse interchange): ``files.write_table_orc``,
  ``read_table_orc``
- JSON metrics reports (S11-S12): ``reports.save_metrics_report``,
  ``load_latest_reports``
"""

from inside_vectordb_spark.sources.files import (
    CORPUS_SCHEMA,
    QRELS_SCHEMA,
    QUERIES_SCHEMA,
    load_beir_data,
    read_corpus_jsonl,
    read_embeddings_parquet,
    read_qrels_tsv,
    read_queries_jsonl,
    read_table_orc,
    write_corpus_jsonl,
    write_embeddings_parquet,
    write_qrels_tsv,
    write_queries_jsonl,
    write_table_orc,
)
from inside_vectordb_spark.sources.reports import (
    load_latest_reports,
    save_metrics_report,
)

__all__ = [
    "CORPUS_SCHEMA",
    "QRELS_SCHEMA",
    "QUERIES_SCHEMA",
    "load_beir_data",
    "read_corpus_jsonl",
    "read_embeddings_parquet",
    "read_qrels_tsv",
    "read_queries_jsonl",
    "read_table_orc",
    "write_corpus_jsonl",
    "write_embeddings_parquet",
    "write_qrels_tsv",
    "write_queries_jsonl",
    "write_table_orc",
    "load_latest_reports",
    "save_metrics_report",
]
