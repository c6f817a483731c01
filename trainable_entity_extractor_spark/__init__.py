"""PySpark-native analytics / KG-construction engine with the query and
data-processing capabilities of huridocs/trainable-entity-extractor.

Built from scratch on the public PySpark DataFrame API. The reference
(/root/reference, read-only) defines WHAT is computed — operator semantics,
method tournament, suggestion/triple outputs — while everything here is
expressed Spark-first: declarative DataFrame plans, broadcast dimension
joins, window functions, and Arrow-vectorized pandas UDFs (never per-row
Python UDFs).
"""

__version__ = "0.1.0"
