from . import conform, dedup, joins, similarity, windows

__all__ = ["conform", "dedup", "joins", "similarity", "windows"]
