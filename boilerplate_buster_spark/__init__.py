"""spark-boilerplate-buster: a PySpark-native corpus-statistical boilerplate
discovery and main-content extraction engine.

Brand-new Spark-first design (NOT a port) with the query/data-processing
capabilities of the reference C++ engine ``raliev/boilerplate-buster``
(read-only at /root/reference). See SURVEY.md for the full structural map.

Layout:
    core/       pure-Python reference-exact semantics (tokenizer + miners);
                used as the golden oracle in tests and as the driver-side
                finalization kernel for the (small, post-aggregation)
                candidate set.
    functions/  column-expression builders (tokenizer, n-grams, hashing,
                text-quality, similarity) - all JVM-side, no per-row Python.
    sources/    readers (text dirs w/ BOM sniffing, CSV-as-corpus, synthetic
                page generator) and sinks (results CSV, SPMF exchange).
    operators/  the DataFrame operators: corpus stats, BloomSpan mining,
                BIDE/CloSpan closed-pattern mining, extraction, dedup
                (exact/MinHash-LSH/SimHash/embedding), ANN similarity.
    plans/      end-to-end pipelines with checkpoint/lineage/metrics/resume.
    streaming/  Structured Streaming ingestion variants.
"""

__version__ = "0.1.0"
