"""Physical-plan introspection utilities (scale hygiene checks)."""
