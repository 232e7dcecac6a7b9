from ssad_tpu.utils import convert, filesystem

__all__ = ["convert", "filesystem"]
