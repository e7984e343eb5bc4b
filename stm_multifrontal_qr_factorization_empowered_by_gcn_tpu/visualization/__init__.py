from .influence import influence

__all__ = ["influence"]
