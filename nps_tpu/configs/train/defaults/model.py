"""Model presets (none defined; group kept for preset-swap semantics)."""
