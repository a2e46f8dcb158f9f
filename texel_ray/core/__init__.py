"""Pure-Python/NumPy geometry + grid core (no Ray dependency)."""
