"""DataFrame operators: corpus statistics, miners, extraction, dedup, ANN."""
