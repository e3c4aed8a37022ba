"""Dataset loaders and artifact writers (host-side, NumPy at the edge)."""
