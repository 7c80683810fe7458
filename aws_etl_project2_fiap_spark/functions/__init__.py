from .registry import TRANSFORMS, gs_now, register_transform, transform
from .scalars import format_ptbr_currency, parse_ptbr_long

__all__ = [
    "TRANSFORMS",
    "gs_now",
    "register_transform",
    "transform",
    "format_ptbr_currency",
    "parse_ptbr_long",
]
