"""Offline tools: PyTorch checkpoint conversion, dataset preparation."""
