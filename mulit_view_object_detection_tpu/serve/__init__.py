from .batcher import MicroBatcher

__all__ = ["MicroBatcher"]
