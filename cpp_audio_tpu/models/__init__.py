"""Synthesizer models (reference L4/L5a equivalents)."""
