"""Host runtime utilities: YAML config, metrics aggregation, tracing."""
