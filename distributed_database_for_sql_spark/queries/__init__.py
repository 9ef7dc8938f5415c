from .base import QuerySpec, register, registry

__all__ = ["QuerySpec", "register", "registry"]
