"""sparktika — a PySpark-native document-extraction engine.

Built from scratch with the capabilities of the reference extractor
(nddipiazza/tika-fork v1.0b15): MIME sniffing, charset detection, HTML
body-text + link extraction, PDF content-stream text extraction,
boilerplate stripping, safety guards (size/char caps, depth/ratio bombs,
per-doc deadlines), plus the relational bookkeeping a web-scale corpus
pipeline needs (dedup, resume anti-join, per-partition metrics).

Layout:
  kernels/   pure-Python, Spark-free document kernels (unit-testable)
  pipeline/  Spark wiring: mapInPandas extraction stage, dedup,
             similarity search, text stats, metrics, resume, IO
  synth.py   deterministic synthetic `pages` corpus (no external data)
"""

__version__ = "0.1.0"
