"""Multi-chip scaling: mesh construction and sharded train steps."""
