"""Placeholder module — queries land incrementally."""
