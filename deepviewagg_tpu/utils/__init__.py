"""Utilities: PLY IO, torch-checkpoint conversion, logging helpers."""
