"""End-to-end plan assembly + spark-submit entry point."""
