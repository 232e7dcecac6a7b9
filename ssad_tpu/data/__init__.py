from ssad_tpu.data import masks, mvtec, synthetic

__all__ = ["masks", "mvtec", "synthetic"]
