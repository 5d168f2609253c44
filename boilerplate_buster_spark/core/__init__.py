"""Pure-Python reference-exact semantics (golden oracle + driver kernel)."""
