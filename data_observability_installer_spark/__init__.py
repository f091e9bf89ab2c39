"""PySpark-native data-observability engine.

A from-scratch implementation of the capabilities of
DataKitchen/data-observability-installer (reference read-only at
/root/reference), re-expressed Spark-first:

- ``operators.profile``   — one-pass column profiling (TestGen task 1;
  reference claim: "51 data characteristics", README.md:207)
- ``operators.hygiene``   — hygiene screens over the profile (task 2)
- ``operators.dq``        — data-quality test vocabulary (tasks 3-5;
  25 observed test types from demo/input_data/data_tests.csv)
- ``operators.obs``       — observability analytics A1-A9 over the
  event grammar of demo/demo/demo_helper.py
- ``operators.llm``       — LLM-pipeline extensions: dedup, similarity
  search, text analysis, multimodal plumbing
- ``streaming``           — Structured Streaming variants of the
  stateful analytics

Everything is DataFrame -> DataFrame; the only Python-side loops run
over *metadata* (test specs, schema fields), never over data rows.
"""

__version__ = "0.1.0"
