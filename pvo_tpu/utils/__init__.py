"""Utilities: config, torch-weight conversion, IO codecs, metrics."""
