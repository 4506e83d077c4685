from .extractor import FrameFeatures, PPGExtractor

__all__ = ["FrameFeatures", "PPGExtractor"]
