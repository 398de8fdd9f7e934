"""Runtime utilities: fixture I/O, timing harness, CSV emission."""
