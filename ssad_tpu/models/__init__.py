from ssad_tpu.models import detector, peranet, resnet

__all__ = ["detector", "peranet", "resnet"]
