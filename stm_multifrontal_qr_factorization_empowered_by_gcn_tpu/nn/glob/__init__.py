"""Whole-graph readouts: add/mean/max/min, attention, Set2Set, sort pool
(``torch_geometric/nn/glob/``).
"""
from .attention_set2set import GlobalAttention, Set2Set, global_sort_pool
from .glob import global_add_pool, global_max_pool, global_mean_pool, global_min_pool

__all__ = [
    "GlobalAttention",
    "Set2Set",
    "global_add_pool",
    "global_max_pool",
    "global_mean_pool",
    "global_min_pool",
    "global_sort_pool",
]
