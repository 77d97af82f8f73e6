from . import cameras

__all__ = ["cameras"]
