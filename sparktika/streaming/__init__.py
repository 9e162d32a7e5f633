"""Structured Streaming surface. The reference is pure batch (SURVEY.md
§2.B: streaming absent), but a web-scale corpus engine needs incremental
ingest; transformations here are written once and shared between batch
DataFrames and readStream DataFrames."""
