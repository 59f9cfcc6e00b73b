"""pinot_pulsar_plugin_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities surrounding
reelevant-tech/pinot-pulsar-plugin (a Pinot stream-ingestion plugin for
Apache Pulsar): a Structured-Streaming-shaped ingestion path with the
plugin's exact semantics (offset codec, seek rules, batch bounding,
at-least-once commit, decode-or-drop JSON), plus the analytic query
surface that ingested data exists to serve — batch + streaming relational
operators and large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) — all idiomatic
Spark DataFrame/SQL so Catalyst/Tungsten/AQE pick the physical strategy.

Layout:
  session.py    SparkSession factory (AQE on, UTC, Arrow on)
  catalog.py    register the testdata parquet tables as temp views
  registry.py   merged (query, oracle-SQL) registry for the driver
  operators/    relational + LLM-pipeline operators
  sources/      pulsar-like streaming source: offset codec, fake broker,
                Python DataSource, JSON decode layer
  streaming/    event-time windows, watermarks, stateful ops, sinks
  functions/    reusable column-expression helpers
  plans/        plan-inspection helpers (explain, shuffle counting)
"""

__version__ = "0.1.0"
