"""Table IO + resumable checkpointing."""
