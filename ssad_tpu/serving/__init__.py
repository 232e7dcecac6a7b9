"""Public serving API, re-exported lazily (PEP 562).

Lazy on purpose: the thin client (`serving/client.py`) is advertised
as stdlib+numpy-only so scoring hosts don't need jax installed or pay
its multi-second import — but `serving/replicas.py` (and the AOT
loader in `serving/export.py`) import jax at module scope.  Eager
re-exports here would make `from ssad_tpu.serving.client import
ServingClient` execute this package __init__ and drag jax in anyway.
Each attribute resolves (and caches) its module on first access.
"""

_EXPORTS = {
    "export_scorer": ("ssad_tpu.serving.export", "export_scorer"),
    "load_scorer": ("ssad_tpu.serving.export", "load_scorer"),
    "save_artifact": ("ssad_tpu.serving.export", "save_artifact"),
    "ServedScorer": ("ssad_tpu.serving.export", "ServedScorer"),
    "BatchingScorer": ("ssad_tpu.serving.server", "BatchingScorer"),
    "AnomalyHTTPServer": ("ssad_tpu.serving.server", "AnomalyHTTPServer"),
    "run_load": ("ssad_tpu.serving.loadgen", "run_load"),
    "npy_body": ("ssad_tpu.serving.loadgen", "npy_body"),
    "fetch_stats": ("ssad_tpu.serving.loadgen", "fetch_stats"),
    "DeviceReplica": ("ssad_tpu.serving.replicas", "DeviceReplica"),
    "device_replicas": ("ssad_tpu.serving.replicas", "device_replicas"),
    "pick_devices": ("ssad_tpu.serving.replicas", "pick_devices"),
    "ScoreTracker": ("ssad_tpu.serving.drift", "ScoreTracker"),
    "ks_statistic": ("ssad_tpu.serving.drift", "ks_statistic"),
    "ks_alert_level": ("ssad_tpu.serving.drift", "ks_alert_level"),
    "quantile_summary": ("ssad_tpu.serving.drift", "quantile_summary"),
    "ServingClient": ("ssad_tpu.serving.client", "ServingClient"),
    "ServingError": ("ssad_tpu.serving.client", "ServingError"),
    "BadRequest": ("ssad_tpu.serving.client", "BadRequest"),
    "NoSuchRoute": ("ssad_tpu.serving.client", "NoSuchRoute"),
    "ClientOverloaded": ("ssad_tpu.serving.client", "Overloaded"),
    "ScoreTimeout": ("ssad_tpu.serving.client", "ScoreTimeout"),
    "ServerFault": ("ssad_tpu.serving.client", "ServerFault"),
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    try:
        module, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    value = getattr(importlib.import_module(module), attr)
    globals()[name] = value  # cache: __getattr__ runs once per name
    return value


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
