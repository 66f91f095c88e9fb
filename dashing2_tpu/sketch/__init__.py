"""Sketch construction: orchestration + sketch-type implementations."""
