"""Shared utilities: logging, config, spaces, checkpointing, plotting."""
