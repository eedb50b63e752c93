"""Utility layer: parsers, GF table generation, config, reference RNG, registry."""
