"""Inference / generation API."""
