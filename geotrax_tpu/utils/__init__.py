"""Shared utilities: constants, logging, paths/naming, palettes, config."""
