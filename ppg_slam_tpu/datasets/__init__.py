from .loaders import load_euroc, load_tumvi, load_uma

__all__ = ["load_euroc", "load_tumvi", "load_uma"]
