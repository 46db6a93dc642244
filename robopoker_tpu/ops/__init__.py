"""Pallas TPU kernels for hot compute paths."""

from .evaluator_pallas import settle_pallas, strength_pallas

__all__ = ["settle_pallas", "strength_pallas"]
