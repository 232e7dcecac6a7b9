from ssad_tpu.train import checkpoint, memory_bank, optim, trainer

__all__ = ["checkpoint", "memory_bank", "optim", "trainer"]
