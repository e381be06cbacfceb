"""Placeholder — filled in by the extensions slice."""
