from . import asof, cleaning, dedup, multimodal, relational, similarity, text, windows

__all__ = [
    "asof",
    "cleaning",
    "dedup",
    "multimodal",
    "relational",
    "similarity",
    "text",
    "windows",
]
