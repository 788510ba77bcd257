"""Training-data pipeline operators over document/embedding tables:
text analysis, deduplication, similarity search, multimodal plumbing.

These extend the reference's operator surface (SURVEY.md §2.3 context)
with the operations a 100 TB training-data pipeline needs. All hot
paths are JVM-side ``pyspark.sql.functions``; Python appears only in
Arrow-batched pandas UDFs (SimHash bit-packing, embedding kernels).
"""
