"""Column-expression builders - JVM-side (whole-stage codegen), no per-row
Python anywhere. Pandas/Arrow UDFs appear only where built-ins genuinely
cannot express the semantics (HTML parse, multimodal decode)."""
