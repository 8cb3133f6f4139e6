from .pytree import pytree_dataclass, field

__all__ = ["pytree_dataclass", "field"]
