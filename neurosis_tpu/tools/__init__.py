"""Standalone tools: VAE blessing, checkpoint conversion."""
