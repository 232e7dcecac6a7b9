from ssad_tpu.ops import image, knn, patches, rasterize

__all__ = ["image", "knn", "patches", "rasterize"]
