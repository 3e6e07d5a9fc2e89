"""Shared shape arithmetic for TPU tiling."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``x`` (Mosaic tile / pad-once math)."""
    return (x + m - 1) // m * m
