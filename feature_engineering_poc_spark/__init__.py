"""feature_engineering_poc_spark — a from-scratch PySpark-native engine.

Re-expresses the capabilities of the reference repo
(surajraikwar/feature-engineering-poc, a Scala/Spark 3.5 config-driven
feature pipeline — see SURVEY.md) as an idiomatic PySpark library, and
layers on a lakehouse table-maintenance engine (bin-packing compaction,
Z-order / Hilbert clustering, manifest rewrite, snapshot expiry + orphan
GC, MERGE INTO) over Iceberg-style tables of pre-tokenized training
sequences, per BASELINE.json's north rule.

Subpackages
-----------
- ``session``    — SparkSession factory (ref: spark/SparkSessionManager.scala:23-134)
- ``config``     — job/source config models + loaders (ref: config/*.scala)
- ``sources``    — source readers S1-S5 (ref: sources/DatabricksSparkSource.scala)
- ``sinks``      — sinks K1-K2 (ref: runner/JobRunner.scala:136-177)
- ``operators``  — feature transformers T1-T10 + factory + pipeline runner
- ``functions``  — text analysis, dedup, similarity, multimodal packs
- ``plans``      — space-filling-curve keys (Z-order / Hilbert), bin packing
- ``lakehouse``  — metadata layer (snapshots/manifests), compaction, MERGE,
                   clustering, snapshot expiry, lineage checkpointing
- ``streaming``  — structured-streaming helpers
"""

__version__ = "0.1.0"
