"""colonnade_spark — a from-scratch PySpark-native per-column
lightweight-compression engine (dict, RLE, FSST, bit-pack,
frame-of-reference) with codec auto-selection.

Semantics derive from byteverse/colonnade (read-only reference at
/root/reference): per-column encoder/decoder combinators, two-pass
stats-then-encode, round-trip isomorphism as the correctness oracle.
Architecture is Spark-first: declarative DataFrame shell planned by Catalyst,
codec kernels as vectorized numpy inside mapInArrow/applyInPandas.
"""

__version__ = "0.1.0"
