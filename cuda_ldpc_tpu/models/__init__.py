"""Code structures (binary QC + non-binary GF(q)) and decoder models."""
