"""Scalar/aggregate helper functions shared across plans and operators."""

from .parity import dsum, davg, MONEY, RATE, QTY  # noqa: F401
