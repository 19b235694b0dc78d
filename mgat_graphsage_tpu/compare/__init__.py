"""Comparison harnesses: PyTorch-CPU reference parity/throughput, the
classical-ML model sweep, and the descriptor statistics study."""

__all__ = []
