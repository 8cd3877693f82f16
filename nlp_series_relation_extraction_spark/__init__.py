"""PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first reimplementation of the query/data-processing
capabilities of the reference repo ``zhoujx4/NLP-Series-relation-extraction``
(a single-machine PyTorch DuIE-2.0 relation-extraction project): four
relation-extraction heads expressed as vectorized Arrow/pandas UDF stages over
a transcripts table, plus the downstream KG stages (entity linking,
canonicalization, triple/edge materialization, DuIE-style evaluation) and the
large-scale training-data-pipeline operators (dedup, similarity search, text
analysis) the reference never had.

Nothing here is a port: execution is DataFrame/Catalyst end-to-end; Python
only runs inside Arrow-batched ``mapInPandas`` stages.
"""

__version__ = "0.1.0"
