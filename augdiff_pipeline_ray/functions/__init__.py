"""Scalar / geometry / OSM-semantics / text / dedup kernels.

Importable into user ``map_batches`` functions — the engine's analogue of the reference's
Spark-UDF extension surface (ingest/src/main/scala/osmesa/functions/package.scala).
"""
