"""recover_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Sage-Bionetworks/recover.

The reference (read-only at /root/reference) is an AWS Glue/Lambda ETL
pipeline for mHealth wearable data.  This package re-expresses its
semantics Spark-first:

- ``schemas``    — declared-schema registry (YAML type strings -> StructType),
                   the analog of src/glue/resources/table_columns.yaml.
- ``sources``    — NDJSON / Parquet readers and partitioned writers
                   (SURVEY.md S1-S8, K1-K6).
- ``functions``  — scalar/curation column expressions (P1-P11) plus
                   portable hashing, text statistics and vector math.
- ``operators``  — reusable DataFrame->DataFrame operators: keyed-latest
                   dedup (W1), anti-join deletes (J1), child re-key (J2),
                   dataset diff (J3), relationalize (N1-N3), audits (A1-A7).
- ``quality``    — expectation suite -> Spark predicate compiler (V1-V3).
- ``streaming``  — incremental (availableNow) wrappers over the batch
                   operators (SURVEY.md §2.9).
- ``ops``        — large-scale training-data operations beyond the
                   reference surface: exact/MinHash/SimHash/Jaccard/embedding
                   dedup, ANN similarity search, text analysis, multimodal
                   column plumbing.
- ``plans``      — per-datatype pipeline composition (the json_to_parquet
                   main loop re-expressed as one DataFrame chain).

Everything is stock DataFrame API; no RDDs, no custom Catalyst rules.
"""

__version__ = "0.1.0"
