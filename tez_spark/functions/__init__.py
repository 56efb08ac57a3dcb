"""Column-level helper functions (text metrics, vector math)."""
