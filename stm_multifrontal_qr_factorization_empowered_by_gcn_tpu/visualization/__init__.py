"""Influence visualization (jacobian-based) — reference
``torch_geometric/visualization/influence.py``.
"""
from .influence import influence

__all__ = ["influence"]
