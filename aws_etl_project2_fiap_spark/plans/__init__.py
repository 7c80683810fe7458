from . import b3, btc

__all__ = ["b3", "btc"]
