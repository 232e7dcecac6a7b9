from ssad_tpu.evaluation import evaluator, inference, metrics

__all__ = ["evaluator", "inference", "metrics"]
