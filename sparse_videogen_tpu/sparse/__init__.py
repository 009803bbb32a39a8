"""Sparse-attention algorithm drivers (SVG1 profiling, SVG2/SAP)."""
