"""gfftoneo4j_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of the reference ETL utility
(corwur/gfftoneo4j: GFF file -> gene/splicing/exon hierarchy -> Neo4j
property graph) as an idiomatic, horizontally-scalable Spark pipeline over
conversation-transcript tables:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
        -> vectorized triple extraction (Arrow pandas UDF)
        -> broadcast alias-dictionary entity linking
        -> iterative connected-components canonicalization
        -> nodes / edges / triples tables (parquet, Iceberg-ready)

plus the relational operator surface the reference exercises (scans,
filters, broadcast joins, hash aggregation, window lead/row_number,
dedup-on-write) and the large-scale training-data operators a 100 TB
corpus pipeline needs (dedup families, similarity search, text analysis).

Everything is DataFrame-first: Catalyst plans the physical execution,
Python only runs inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from gfftoneo4j_spark.session import get_spark  # noqa: F401
