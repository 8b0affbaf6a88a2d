"""prod2vec_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of richjdowney/prod2vec, rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is a single-node
pandas/TensorFlow pipeline that trains product embeddings from
market-basket data. This engine re-expresses every capability as lazy
DataFrame dataflow (Catalyst-optimized, shuffle-aware, 100 TB-ready) and
adds the LLM-data-pipeline operator family (dedup, similarity search,
text analysis, multimodal plumbing) as first-class operators.

Layout:
  session     — SparkSession factory tuned for local[32] test / cluster parity
  sources     — table registry + parquet/csv scan & sink helpers
  operators   — relational core, baskets/vocab, skip-gram, quality gates,
                text analysis, dedup, similarity search, multimodal
  functions   — reusable Column expression builders (vector math, hashing,
                seeded pseudo-randomness)
  ml          — MLlib Word2Vec wrapper (training, synonyms, tuning)
  plans       — physical-plan inspection helpers (pushdown/codegen asserts)
  streaming   — Structured Streaming variants of the incremental operators
  pipeline    — config-driven end-to-end runner (replaces the Airflow DAG)
"""

__version__ = "0.1.0"
