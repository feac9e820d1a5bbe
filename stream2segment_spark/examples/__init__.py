"""Runnable user-level examples mirroring the reference's processing
templates (resources/templates/) on this engine."""
