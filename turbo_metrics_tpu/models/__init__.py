"""Metric engines (the "model" layer): one class per metric family."""
