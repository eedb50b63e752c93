"""Compute primitives: channel ops, GF(q) ops, min-sum, EMS/TMM, Pallas kernels."""
