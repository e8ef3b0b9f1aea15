"""Placeholder — filled in a later wave."""
