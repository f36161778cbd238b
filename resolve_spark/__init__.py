"""resolve_spark — a PySpark-native entity-resolution (record-linkage) engine.

Re-expresses the capabilities of the reference Go engine (TFMV/resolve,
snapshot at /root/reference) as an idiomatic Spark DataFrame dataflow:

    ingest -> normalize -> multi-pass blocking (canopy | q-gram | MinHash-LSH)
           -> skew-salted candidate-pair generation under a pair budget
           -> vectorized pairwise scoring (Arrow-batched pandas UDFs +
              native Column expressions; no per-row Python)
           -> threshold -> per-query top-k | global transitive clustering
              (large-star / small-star connected components)
           -> match-group statistics

The reference's client/server pieces (Weaviate vector store, embedding HTTP
service, REST API) are replaced by their batch-engine equivalents: columnar
tables (parquet, Iceberg-layout), a deterministic mock embedder matching the
reference's test embedder (internal/embed/embed.go:233-242), and a pipeline
driver with resumable stage checkpoints.
"""

__version__ = "0.1.0"
