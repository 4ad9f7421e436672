from . import domanda

__all__ = ["domanda"]
