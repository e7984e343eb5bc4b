from .topk_pool import TopKPooling, topk_pool, TopKOutput

__all__ = ["TopKPooling", "topk_pool", "TopKOutput"]
