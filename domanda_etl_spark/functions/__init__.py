from . import scalars, text, vectors

__all__ = ["scalars", "text", "vectors"]
