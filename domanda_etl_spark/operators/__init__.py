from . import conform, dedup, joins, multimodal, similarity, windows

__all__ = ["conform", "dedup", "joins", "multimodal", "similarity", "windows"]
