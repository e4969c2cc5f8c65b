"""Column-level helpers shared by operators and the oracle contract."""
