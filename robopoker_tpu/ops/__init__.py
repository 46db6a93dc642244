"""Pallas TPU kernels for hot compute paths."""

from .evaluator_pallas import strength_pallas

__all__ = ["strength_pallas"]
