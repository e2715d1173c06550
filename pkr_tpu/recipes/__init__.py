"""Recipe drivers: corpus manifest builders and the stage-gated CLI."""
