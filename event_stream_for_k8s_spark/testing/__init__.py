"""Self-check utilities mirroring the driver's correctness gate."""
