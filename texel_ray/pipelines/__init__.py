"""End-to-end Ray Data pipelines (the engine's public entry points)."""
