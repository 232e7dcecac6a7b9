from ssad_tpu.serving.export import (  # noqa: F401
    export_scorer, load_scorer, save_artifact, ServedScorer,
)
from ssad_tpu.serving.server import (  # noqa: F401
    BatchingScorer, AnomalyHTTPServer,
)
from ssad_tpu.serving.loadgen import (  # noqa: F401
    run_load, npy_body, fetch_stats,
)
from ssad_tpu.serving.replicas import (  # noqa: F401
    DeviceReplica, device_replicas, pick_devices,
)
from ssad_tpu.serving.drift import (  # noqa: F401
    ScoreTracker, ks_statistic, ks_alert_level, quantile_summary,
)
from ssad_tpu.serving.client import (  # noqa: F401
    ServingClient, ServingError, BadRequest, NoSuchRoute, Overloaded as
    ClientOverloaded, ScoreTimeout, ServerFault,
)
