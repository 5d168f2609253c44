"""Readers and sinks: text dirs (BOM sniffing), CSV-as-corpus, synthetic
Common-Crawl-style pages, results CSV, SPMF exchange format."""
