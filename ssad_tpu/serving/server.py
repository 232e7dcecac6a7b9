"""Serving runtime: request batching + a stdlib HTTP front end.

TPU serving economics are batch economics: the scoring programs are
compiled for ONE fixed batch shape (serving/export.py), a single
program launch amortizes the dispatch cost over the whole batch, and a
half-empty batch wastes the difference.  `BatchingScorer` is the
classic dynamic batcher: callers submit single images from any thread
and get futures; a collector thread drains the queue until the batch
fills or `max_delay_ms` expires, pads, runs the scorer once, and
fans results back out.  (The reference has nothing comparable — its
inference is an offline Lightning predict loop, tools.py:310-390.)

`AnomalyHTTPServer` puts a dependency-free HTTP API in front (stdlib
`ThreadingHTTPServer` — this image has no web framework):

  POST /score    body: raw .npy (H, W, 3) — float in [0,1] (enforced:
                 off-scale floats are 400, not silently mis-scored) or
                 uint8 (rescaled) — or any image file PIL can decode
                 (PNG/JPEG; resized to the model's input geometry).  → JSON {score, label, ...} for image
                 mode; {map_max, map_mean, heatmap_b64?} for patch mode
                 (`?heatmap=1` adds the base64 PNG heatmap).
  GET  /healthz  → {"ok": true} (liveness: the process is up)
  GET  /readyz   → {"ready": true} or 503 (readiness: a zero image
                 actually scores through every batcher)
  GET  /stats    → batcher latency/occupancy counters + the score-stream
                 window and its drift KS vs the artifact's baked
                 calibration distribution (JSON, for humans;
                 serving/drift.py)
  GET  /metrics  → the same counters in Prometheus exposition format
                 (for scrapers), incl. ssad_score_drift_ks /
                 ssad_score_drift_alert.

Scorer plumbing is callable-agnostic: anything mapping a float32
(B, H, W, 3) array to a tuple of per-row arrays serves — a deserialized
AOT artifact (ServedScorer), a live InferenceEngine closure, or a test
stub.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence, Tuple

import numpy as np


class Overloaded(RuntimeError):
    """The batcher's admission queue is full — shed load (HTTP 503)."""


class _Request:
    __slots__ = ("image", "event", "result", "error", "t_submit")

    def __init__(self, image: np.ndarray):
        self.image = image
        self.event = threading.Event()
        self.result: Optional[Tuple[np.ndarray, ...]] = None
        self.error: Optional[BaseException] = None
        self.t_submit = time.perf_counter()


class BatchingScorer:
    """Dynamic batcher around one or many fixed-batch scoring callables.

    `score_fn` may be a single callable or a sequence of them.  With
    several (e.g. one replica per TPU chip, serving/replicas.py), the
    collector thread still assembles batches serially — batching policy
    stays in ONE place — but hands each assembled batch to a pool of
    runner threads, one pinned per callable, so up to `len(score_fn)`
    batches execute concurrently.  The hand-off queue is bounded at the
    runner count: when every replica is busy, assembly blocks, and
    admission pressure surfaces at `max_queue` as 503s exactly like the
    single-replica case.
    """

    def __init__(
        self,
        score_fn: Callable[[np.ndarray], Sequence[np.ndarray]] | Sequence[Callable],
        batch: int,
        max_delay_ms: float = 5.0,
        max_queue: Optional[int] = 256,
    ):
        import collections

        fns = list(score_fn) if isinstance(score_fn, (list, tuple)) else [score_fn]
        if not fns:
            raise ValueError("need at least one scoring callable")
        self._fns = fns
        self.batch = int(batch)
        self.max_delay = max_delay_ms / 1e3
        #: admission bound: when this many requests are already queued,
        #: submit() sheds load (Overloaded → HTTP 503) instead of
        #: growing latency without limit.  None disables the bound.
        self.max_queue = max_queue
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._lock = threading.Lock()
        # bounded: a serving daemon must not grow metrics without limit
        self._latencies = collections.deque(maxlen=1024)
        self._occupancies = collections.deque(maxlen=1024)
        self._n_requests = 0
        self._n_batches = 0
        self._runner_batches = [0] * len(fns)
        self._closed = False
        #: how long close() waits for the collector before concluding
        #: it is wedged in a scorer call (tests shrink this)
        self._join_s = 10.0
        if len(fns) > 1:
            self._run_queue: Optional["queue.Queue"] = queue.Queue(maxsize=len(fns))
            self._runners = [
                threading.Thread(target=self._runner_loop, args=(i,), daemon=True)
                for i in range(len(fns))
            ]
            for t in self._runners:
                t.start()
        else:
            self._run_queue = None
            self._runners = []
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client side ---------------------------------------------------------

    def submit(self, image: np.ndarray) -> _Request:
        if self._closed:
            raise RuntimeError("scorer is closed")
        # qsize() is approximate under concurrency, which is fine for
        # load shedding — the bound needs to hold statistically, not
        # exactly (an off-by-a-few admission costs microseconds; an
        # unbounded queue costs unbounded latency)
        if self.max_queue is not None and self._queue.qsize() >= self.max_queue:
            raise Overloaded(
                f"admission queue full ({self.max_queue} pending)"
            )
        req = _Request(np.asarray(image, dtype=np.float32))
        self._queue.put(req)
        return req

    def score(self, image: np.ndarray, timeout: float = 60.0):
        """Blocking single-image scoring: tuple of per-image results."""
        req = self.submit(image)
        if not req.event.wait(timeout):
            raise TimeoutError("scoring timed out")
        if req.error is not None:
            raise req.error
        return tuple(r[0] for r in req.result)

    def stats(self) -> dict:
        """Totals are lifetime counters; percentiles/occupancy are over
        the last ≤1024 requests/batches (bounded memory)."""
        with self._lock:
            lat = sorted(self._latencies)
            occ = list(self._occupancies)
            n_req, n_bat = self._n_requests, self._n_batches
        pct = lambda p: (lat[min(int(p * len(lat)), len(lat) - 1)] * 1e3
                         if lat else None)
        out = {
            "requests": n_req,
            "batches": n_bat,
            "mean_batch_occupancy": float(np.mean(occ)) if occ else None,
            "latency_ms_p50": pct(0.50),
            "latency_ms_p95": pct(0.95),
            "queue_depth": self._queue.qsize(),
            "max_queue": self.max_queue,
        }
        if len(self._fns) > 1:
            with self._lock:
                out["replicas"] = len(self._fns)
                out["replica_batches"] = list(self._runner_batches)
        return out

    def close(self):
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            self._thread.join(timeout=self._join_s)
            if self._thread.is_alive():
                # the collector is stuck in a long scorer call (the
                # tunneled TPU can stall for minutes) and has NOT seen
                # the sentinel yet — draining the queue here could eat
                # that sentinel and strand the collector (and, with
                # replicas, every runner thread) forever.  Leave the
                # queue alone: when the collector unblocks it consumes
                # the sentinel, stops the runners and cancels whatever
                # is still pending itself (_loop).
                return
            for t in self._runners:
                t.join(timeout=self._join_s)
            # requests that raced past the _closed check in submit() may
            # sit behind the sentinel — fail them fast instead of
            # leaving their callers to block out the full score timeout
            self._cancel_pending()

    def _cancel_pending(self):
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            if req is not None:
                req.error = RuntimeError("scorer is closed")
                req.event.set()

    # -- collector thread ----------------------------------------------------

    def _loop(self):
        while True:
            req = self._queue.get()
            if req is None:
                self._stop_runners()
                self._cancel_pending()
                return
            reqs = [req]
            deadline = time.perf_counter() + self.max_delay
            while len(reqs) < self.batch:
                budget = deadline - time.perf_counter()
                if budget <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=budget)
                except queue.Empty:
                    break
                if nxt is None:
                    self._dispatch(reqs)
                    self._stop_runners()
                    self._cancel_pending()
                    return
                reqs.append(nxt)
            self._dispatch(reqs)

    def _dispatch(self, reqs):
        if self._run_queue is None:
            self._run(reqs, 0)
        else:
            # blocks when every replica is busy AND one batch is already
            # staged per runner — backpressure reaches max_queue
            self._run_queue.put(reqs)

    def _stop_runners(self):
        if self._run_queue is not None:
            # runners drain FIFO: every staged batch is executed before
            # its runner sees the sentinel
            for _ in self._runners:
                self._run_queue.put(None)

    def _runner_loop(self, idx: int):
        while True:
            reqs = self._run_queue.get()
            if reqs is None:
                return
            self._run(reqs, idx)

    def _run(self, reqs, fn_idx: int):
        n = len(reqs)
        try:
            x = np.stack([r.image for r in reqs])
            if n < self.batch:
                x = np.pad(x, ((0, self.batch - n),) + ((0, 0),) * 3)
            results = tuple(np.asarray(r) for r in self._fns[fn_idx](x))
            now = time.perf_counter()
            with self._lock:
                self._occupancies.append(n / self.batch)
                self._latencies.extend(now - r.t_submit for r in reqs)
                self._n_batches += 1
                self._n_requests += n
                self._runner_batches[fn_idx] += 1
            for i, r in enumerate(reqs):
                r.result = tuple(res[i : i + 1] for res in results)
                r.event.set()
        except BaseException as e:  # propagate to every waiter
            for r in reqs:
                r.error = e
                r.event.set()


# -- HTTP front end ----------------------------------------------------------


def _decode_image(body: bytes, imsize: Tuple[int, int]) -> np.ndarray:
    """Request body → (H, W, 3) float32 in [0,1].

    Geometry is validated HERE, before the request enters the batcher:
    a wrong-shaped array inside a batch would fail the whole batch and
    take innocent co-batched requests down with it.

    Encoded images go through `mvtec.load_image` — the SAME
    open→resize→convert decode the training/evaluation pipeline uses
    (its order matters for palette/RGBA inputs; a serving-side
    reimplementation would skew scores vs. the evaluator).
    """
    if body[:6] == b"\x93NUMPY":
        arr = np.load(io.BytesIO(body))
        return coerce_image_array(arr, imsize)
    from ssad_tpu.data.mvtec import load_image

    return load_image(io.BytesIO(body), imsize)


def coerce_image_array(arr: np.ndarray, imsize: Tuple[int, int]) -> np.ndarray:
    """Validate/convert a raw array to the model's (H, W, 3) float32
    [0,1] contract.  uint8 is rescaled (the unambiguous intent); float
    inputs outside [0,1] are REJECTED rather than scored — a 255-scale
    float image would silently produce garbage scores against a
    threshold calibrated on [0,1] data.  Shared by the HTTP front end
    and `cli score` so both surfaces enforce the same contract."""
    if arr.shape != (imsize[0], imsize[1], 3):
        raise ValueError(
            f"npy body must be ({imsize[0]}, {imsize[1]}, 3) to match "
            f"the model geometry, got {arr.shape}"
        )
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if not np.issubdtype(arr.dtype, np.floating):
        raise ValueError(
            f"npy dtype must be float or uint8, got {arr.dtype}"
        )
    arr = arr.astype(np.float32)
    lo, hi = float(arr.min()) if arr.size else 0.0, float(arr.max()) if arr.size else 0.0
    if lo < -1e-3 or hi > 1.0 + 1e-3:
        raise ValueError(
            f"float npy values must be in [0, 1] (got range "
            f"[{lo:.3g}, {hi:.3g}]); scale before posting — scoring an "
            f"off-scale image would silently mis-threshold"
        )
    return arr


def heatmap_to_uint8(amap: np.ndarray) -> np.ndarray:
    """Min-max normalize an anomaly map to a uint8 grayscale image —
    the ONE rendering policy shared by the HTTP `?heatmap=1` response
    and `cli score --heatmaps` (diverging copies would make the same
    artifact render differently per surface)."""
    lo, hi = float(amap.min()), float(amap.max())
    norm = (amap - lo) / (hi - lo + 1e-12)
    return (norm * 255).astype(np.uint8)


def _heatmap_png_b64(amap: np.ndarray) -> str:
    import base64

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(heatmap_to_uint8(amap)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _prometheus_metrics(models: dict, trackers: Optional[dict] = None) -> str:
    """BatchingScorer.stats() for every model → Prometheus text format.

    Counter/gauge/summary naming per the exposition-format conventions;
    one `model` label routes multi-model servers to per-model series.
    `trackers` (serving/drift.py ScoreTrackers, same keys) adds the
    score-stream families: recent-score quantiles and the drift KS
    against the artifact's baked calibration distribution.
    """
    stats = {name: sc.stats() for name, (sc, _) in sorted(models.items())}
    if trackers:
        for name, st in stats.items():
            # .get: `models` and `trackers` are snapshotted as two
            # separate reads while /admin/reload swaps both — a torn
            # read across a name change must degrade to "no score
            # families for that model", not a KeyError mid-scrape
            tracker = trackers.get(name)
            if tracker is not None:
                st.update(
                    ("score_" + k, v) for k, v in tracker.stats().items()
                )

    # the exposition format requires each metric family to be ONE
    # uninterrupted group (HELP/TYPE first, then every sample) — strict
    # parsers reject interleaved families
    families = (
        ("ssad_requests_total", "counter",
         "Scored requests since start.",
         lambda st, name: [(f'{{model="{name}"}}', st["requests"])]),
        ("ssad_batches_total", "counter",
         "Executed scoring batches since start.",
         lambda st, name: [(f'{{model="{name}"}}', st["batches"])]),
        ("ssad_replica_batches_total", "counter",
         "Batches executed per device replica (serve --devices).",
         lambda st, name: [
             (f'{{model="{name}",replica="{i}"}}', v)
             for i, v in enumerate(st.get("replica_batches") or [])
         ]),
        ("ssad_queue_depth", "gauge",
         "Requests waiting for admission right now.",
         lambda st, name: [(f'{{model="{name}"}}', st["queue_depth"])]),
        ("ssad_batch_occupancy_mean", "gauge",
         "Mean filled fraction of recent batches.",
         lambda st, name: [] if st["mean_batch_occupancy"] is None else
         [(f'{{model="{name}"}}', f"{st['mean_batch_occupancy']:.6f}")]),
        ("ssad_request_latency_ms", "summary",
         "Client-to-result latency quantiles over recent requests.",
         lambda st, name: [
             (f'{{model="{name}",quantile="{q}"}}', f"{st[key]:.6f}")
             for q, key in (("0.5", "latency_ms_p50"),
                            ("0.95", "latency_ms_p95"))
             if st[key] is not None
         ]),
        ("ssad_recent_score", "summary",
         "Anomaly-score quantiles over the recent request window.",
         lambda st, name: [
             (f'{{model="{name}",quantile="{q}"}}', f"{st[key]:.6f}")
             for q, key in (("0.5", "score_recent_p50"),
                            ("0.95", "score_recent_p95"))
             if st.get(key) is not None
         ]),
        ("ssad_score_drift_ks", "gauge",
         "KS distance of recent scores vs the artifact's calibration "
         "distribution (serving/drift.py).",
         lambda st, name: [] if st.get("score_drift_ks") is None else
         [(f'{{model="{name}"}}', f"{st['score_drift_ks']:.6f}")]),
        ("ssad_score_drift_alert", "gauge",
         "1 when the drift KS exceeds the alpha=0.05 critical value.",
         lambda st, name: [] if st.get("score_drift_alert") is None else
         [(f'{{model="{name}"}}', int(st["score_drift_alert"]))]),
    )
    lines = []
    for fam, kind, help_text, samples in families:
        lines.append(f"# HELP {fam} {help_text}")
        lines.append(f"# TYPE {fam} {kind}")
        for name, st in stats.items():
            for labels, value in samples(st, name):
                lines.append(f"{fam}{labels} {value}")
    return "\n".join(lines) + "\n"


# -- route semantics, shared by the stdlib and native front ends -------------
#
# The transport differs (ThreadingHTTPServer threads vs the C++ epoll
# loop in native/http_frontend.cpp), but the payloads MUST NOT: these
# helpers are the single source of truth for what each route returns.


def perform_reload(server) -> Tuple[int, dict]:
    """POST /admin/reload semantics, shared by both front ends.

    Swaps in freshly loaded (and WARMED — the reloader is
    `cli serve`'s artifact loader, which compiles before returning)
    models without dropping traffic: the new batchers are built first,
    the `models`/`trackers` dicts are replaced atomically (one
    reference assignment under the GIL), and only then are the old
    batchers closed.  `BatchingScorer.close` is graceful for work
    already submitted — the collector drains every queued request
    before it sees the close sentinel — so in-flight requests finish
    against the old program.  A request that *races* the swap (fetched
    the old batcher, submits after close) gets one retry against the
    current models (see the front ends).

    Returns (status, payload).  404 when no reloader is configured
    (servers constructed directly from live scorers have nothing to
    reload from); 409 when a reload is already running; 500 — with the
    OLD models still serving — when the reloader itself fails.

    Reloads assume unchanged input geometry per model name: requests
    decoded against the old `imsize` in the swap window would fail
    against a new geometry (a 400/500 for that request, not a crash).
    """
    reloader = getattr(server, "_reloader", None)
    if reloader is None:
        return 404, {"error": "no reloader configured (start the server "
                              "via `cli serve` to enable /admin/reload)"}
    if not server._reload_lock.acquire(blocking=False):
        return 409, {"error": "a reload is already in progress"}
    try:
        t0 = time.perf_counter()
        try:
            new_models, warmup_s = reloader()
        except Exception as e:
            return 500, {"error": f"reload failed; previous models still "
                                  f"serving: {e!r}"}
        from ssad_tpu.serving.drift import ScoreTracker

        old = server.models
        server.trackers = {
            name: ScoreTracker(baseline=m.get("calibration"))
            for name, (_, m) in new_models.items()
        }
        server.models = dict(new_models)
        if len(new_models) == 1:
            server.scorer, server.meta = next(iter(new_models.values()))
        for sc, _ in old.values():
            sc.close()
        return 200, {
            "reloaded": sorted(new_models),
            "warmup_s": round(warmup_s, 2),
            "total_s": round(time.perf_counter() - t0, 2),
        }
    finally:
        server._reload_lock.release()


def score_with_reload_retry(server, name: str, scorer, image, timeout: float):
    """`scorer.score` with ONE retry against the server's current
    models when the batcher was closed under us by /admin/reload (the
    request fetched the old batcher, the swap landed, close() beat the
    submit).  Shared by both front ends."""
    try:
        return scorer.score(image, timeout=timeout)
    except RuntimeError as e:
        if "scorer is closed" not in str(e):
            raise
        current = server.models.get(name)
        if current is None:
            raise
        return current[0].score(image, timeout=timeout)


def build_healthz(models: dict, meta: Optional[dict]) -> dict:
    if len(models) > 1:
        return {"ok": True, "models": {
            name: m.get("mode") for name, (_, m) in models.items()
        }}
    return {"ok": True, "mode": (meta or {}).get("mode")}


def build_readyz(models: dict, ready_timeout: float) -> Tuple[int, dict]:
    """(status_code, payload): actually score a zero image through
    every batcher — see the /readyz route doc below."""
    failures = {}
    for name, (sc, m) in models.items():
        try:
            h, w = m["imsize"]
            sc.score(np.zeros((h, w, 3), np.float32), timeout=ready_timeout)
        except Exception as e:
            failures[name] = repr(e)
    if failures:
        return 503, {"ready": False, "failures": failures}
    return 200, {"ready": True}


def build_stats(models: dict, trackers: dict) -> dict:
    # .get: the two dicts are snapshotted separately while a reload
    # swaps both; a torn read across a model-name change yields empty
    # score stats for that model rather than a KeyError that (on the
    # native front end) would kill the sole poller thread
    def scores(name: str) -> dict:
        tracker = trackers.get(name)
        return tracker.stats() if tracker is not None else {}

    if len(models) > 1:
        return {
            name: {**sc.stats(), "scores": scores(name)}
            for name, (sc, _) in models.items()
        }
    name = next(iter(models))
    sc, _ = models[name]
    return {**sc.stats(), "scores": scores(name)}


def build_score_payload(
    result, meta: dict, want_heatmap: bool, ms: float
) -> Tuple[dict, float]:
    """(response payload, the scalar the drift tracker observes)."""
    if meta.get("mode") == "patch":
        amap = np.asarray(result[0])
        payload = {
            "map_max": float(amap.max()),
            "map_mean": float(amap.mean()),
            "ms": round(ms, 3),
        }
        if want_heatmap:
            payload["heatmap_b64"] = _heatmap_png_b64(amap)
        return payload, payload["map_max"]
    score, label = result[0], result[1]
    payload = {
        "score": float(score),
        "label": int(label),
        "threshold": meta.get("threshold"),
        "ms": round(ms, 3),
    }
    if len(result) > 2:
        payload["logits"] = np.asarray(result[2]).tolist()
    return payload, payload["score"]


def want_heatmap(query: str) -> bool:
    from urllib.parse import parse_qs

    return parse_qs(query).get("heatmap", ["0"])[0] == "1"


class AnomalyHTTPServer:
    """Bind one or many BatchingScorers to an HTTP port.  `port=0`
    picks a free port (read it back from `.port`).

    Single-model form (`AnomalyHTTPServer(scorer, meta)`) routes
    `POST /score`.  Multi-model form (`models={name: (scorer, meta)}`)
    adds `POST /score/<name>` — one process serves a whole category
    sweep (the reference evaluates 15 MVTec categories; production
    serving wants them behind one port, not 15 daemons).  `/score`
    without a name keeps working while exactly one model is loaded.
    """

    def __init__(
        self,
        scorer: Optional[BatchingScorer] = None,
        meta: Optional[dict] = None,
        host: str = "127.0.0.1",
        port: int = 0,
        score_timeout: float = 60.0,
        models: Optional[dict] = None,
        ready_timeout: float = 10.0,
        reloader: Optional[Callable[[], Tuple[dict, float]]] = None,
    ):
        if models is None:
            if scorer is None or meta is None:
                raise ValueError("pass (scorer, meta) or models={name: (scorer, meta)}")
            models = {meta.get("subject") or "default": (scorer, meta)}
        #: () -> ({name: (BatchingScorer, meta)}, warmup_s) — enables
        #: POST /admin/reload (hot artifact swap, perform_reload above)
        self._reloader = reloader
        self._reload_lock = threading.Lock()
        self.models = dict(models)
        if scorer is None and len(self.models) == 1:
            scorer, meta = next(iter(self.models.values()))
        self.scorer = scorer
        self.meta = meta
        self.score_timeout = float(score_timeout)
        self.ready_timeout = float(ready_timeout)
        # one score-stream tracker per model; artifacts exported with a
        # baked calibration grid get drift monitoring, others still get
        # the recent-score window (serving/drift.py)
        from ssad_tpu.serving.drift import ScoreTracker

        self.trackers = {
            name: ScoreTracker(baseline=m.get("calibration"))
            for name, (_, m) in self.models.items()
        }
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 for keep-alive: the stdlib default (HTTP/1.0)
            # closes the socket after every response, making each
            # client request pay a fresh TCP connect.  Safe here: every
            # response path sends Content-Length (_json/_text).
            protocol_version = "HTTP/1.1"
            # TCP_NODELAY (a StreamRequestHandler attribute): the
            # handler writes headers and body as two segments; with
            # Nagle on, the body segment waits for the client's delayed
            # ACK of the header segment — a flat ~40 ms floor on EVERY
            # keep-alive response (measured: p50 44 ms → 3 ms on a
            # trivial scorer)
            disable_nagle_algorithm = True

            def log_message(self, *args):  # quiet
                pass

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                if self.close_connection:
                    # tell the client too (sending the header also keeps
                    # close_connection set through end_headers)
                    self.send_header("Connection", "close")
                self.end_headers()
                self.wfile.write(body)

            def _text(self, code: int, body: str, ctype: str):
                payload = body.encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                if self.path == "/metrics":
                    # Prometheus exposition format — the scrape surface
                    # monitoring fleets actually consume (/stats is the
                    # human-readable JSON twin).  Quantiles follow the
                    # summary-metric convention; occupancy/queue depth
                    # are gauges.
                    self._text(200,
                               _prometheus_metrics(outer.models,
                                                   outer.trackers),
                               "text/plain; version=0.0.4")
                elif self.path.partition("?")[0] == "/readyz":
                    # READINESS (vs /healthz liveness): actually score a
                    # zero image through every batcher — a dead
                    # collector thread, broken program, or saturated
                    # queue turns the probe 503 so the load balancer
                    # stops routing here.  Bounded by a short timeout.
                    code, payload = build_readyz(outer.models,
                                                 outer.ready_timeout)
                    self._json(code, payload)
                elif self.path == "/healthz":
                    self._json(200, build_healthz(outer.models, outer.meta))
                elif self.path == "/stats":
                    self._json(200, build_stats(outer.models, outer.trackers))
                else:
                    self._json(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                path, _, query = self.path.partition("?")
                # body framing is Content-Length only; a chunked body
                # cannot be drained by the read below, and under
                # keep-alive its unread bytes would desync the socket
                # (parsed as the next request line).  Reject AND close.
                if "chunked" in (self.headers.get("Transfer-Encoding") or "").lower():
                    self.close_connection = True
                    self._json(411, {
                        "error": "chunked bodies are not supported; send "
                                 "Content-Length",
                    })
                    return
                # drain the body BEFORE any (error) response: replying
                # with an unread request body breaks the connection
                # (the client sees a reset instead of the status)
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                if path == "/admin/reload":
                    # synchronous: the response arrives once the new
                    # programs are loaded, warmed, swapped in and the
                    # old batchers drained — size client timeouts for a
                    # compile (minutes through a remote tunnel)
                    code, payload = perform_reload(outer)
                    self._json(code, payload)
                    return
                # snapshot: /admin/reload replaces outer.models mid-
                # flight; one local reference keeps this request's
                # routing, scoring and drift bookkeeping consistent
                models = outer.models
                trackers = outer.trackers
                if path == "/score":
                    if len(models) > 1:
                        self._json(400, {
                            "error": "several models are loaded; POST "
                                     "/score/<name>",
                            "models": sorted(models),
                        })
                        return
                    name = next(iter(models))
                    scorer, meta = models[name]
                elif path.startswith("/score/"):
                    name = path[len("/score/"):]
                    if name not in models:
                        self._json(404, {
                            "error": f"no model {name!r}",
                            "models": sorted(models),
                        })
                        return
                    scorer, meta = models[name]
                else:
                    self._json(404, {"error": f"no route {path}"})
                    return
                # client errors (bad body/geometry) → 400; queue-full
                # load shedding → 503; scoring timeouts → 504; internal
                # scorer faults → 500 (load balancers and retry logic
                # key on the 4xx/5xx split; 503 specifically signals
                # "retry elsewhere / back off")
                try:
                    image = _decode_image(body, tuple(meta["imsize"]))
                except Exception as e:
                    self._json(400, {"error": repr(e)})
                    return
                try:
                    t0 = time.perf_counter()
                    result = score_with_reload_retry(
                        outer, name, scorer, image,
                        timeout=outer.score_timeout,
                    )
                    ms = (time.perf_counter() - t0) * 1e3
                    payload, primary = build_score_payload(
                        result, meta, want_heatmap(query), ms
                    )
                    # feed the drift tracker the same scalar the client
                    # sees: the anomaly score (image) / map max (patch).
                    # .get: the models/trackers snapshots above are two
                    # reads a concurrent reload can tear — losing one
                    # drift observation is fine, a KeyError 500 for a
                    # request that scored is not
                    tracker = trackers.get(name)
                    if tracker is not None:
                        tracker.observe(primary)
                    self._json(200, payload)
                except Overloaded as e:
                    self._json(503, {"error": repr(e)})
                except TimeoutError as e:
                    self._json(504, {"error": repr(e)})
                except Exception as e:
                    self._json(500, {"error": repr(e)})

        class Server(ThreadingHTTPServer):
            # the stdlib default TCP listen backlog (5) drops/resets
            # connections under concurrent request bursts — exactly the
            # load pattern the dynamic batcher exists to absorb
            # (measured: 1 reset in a 24-way burst on a 1-core host)
            request_queue_size = 128

        self._httpd = Server((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        for sc, _ in self.models.values():
            sc.close()
