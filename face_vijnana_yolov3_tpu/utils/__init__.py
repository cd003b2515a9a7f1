"""Utilities: image IO, box drawing, timing."""
