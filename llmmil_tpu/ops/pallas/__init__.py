from .mil_pool import mil_pool, mil_pool_reference

__all__ = ["mil_pool", "mil_pool_reference"]
