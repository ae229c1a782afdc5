"""Test and benchmarking support utilities."""
