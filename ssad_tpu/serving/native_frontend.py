"""Native (C++) serving front end: ctypes binding + the server class.

`NativeAnomalyHTTPServer` is a drop-in replacement for the stdlib
`AnomalyHTTPServer` (same constructor, same routes, same payloads —
the route semantics live in ONE place, serving/server.py's build_*
helpers) with the transport moved off the GIL into
native/http_frontend.cpp: accept, HTTP/1.1 parsing, keep-alive
sequencing, protocol errors, transport-level load shedding and
response writes all happen on a C++ epoll thread.  Python sees
fully-parsed requests in batches through one blocking `nhf_poll` call
(which releases the GIL) and answers with small JSON bodies.

Why it's faster than the stdlib front end: ThreadingHTTPServer spawns
a Python thread per connection and parses headers with readline under
the GIL — at high request rates the GIL becomes the front end's
bottleneck before the TPU program does.  Here the per-request Python
work is one dict→json dump.  Select it with ``cli serve --frontend
native`` (stdlib remains the default; the native path requires g++ at
first use and falls back loudly when unavailable).

Threading model:
  C++ epoll thread   — all socket I/O and HTTP framing
  poller thread (py) — drains nhf_poll, serves GET routes inline,
                       decodes POST bodies, submits to the batcher
  responder pool     — waits on batch futures, builds payloads,
                       feeds the drift tracker, responds
  BatchingScorer     — unchanged (collector thread per model)
"""

from __future__ import annotations

import ctypes
import json
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent / "native" / "http_frontend.cpp"
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


class _NhfReq(ctypes.Structure):
    _fields_ = [
        ("id", ctypes.c_int64),
        ("method", ctypes.c_char_p),
        ("path", ctypes.c_char_p),
        ("body", ctypes.POINTER(ctypes.c_char)),
        ("body_len", ctypes.c_int64),
    ]


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    import os

    if os.environ.get("SSAD_NATIVE", "1") == "0":
        return None
    from ssad_tpu.native import build_library

    so = build_library(_SRC, "ssadhttp")
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.nhf_create.restype = ctypes.c_void_p
    lib.nhf_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_long]
    lib.nhf_start.restype = ctypes.c_int
    lib.nhf_start.argtypes = [ctypes.c_void_p]
    lib.nhf_poll.restype = ctypes.c_int
    lib.nhf_poll.argtypes = [ctypes.c_void_p, ctypes.POINTER(_NhfReq),
                             ctypes.c_int, ctypes.c_int]
    lib.nhf_respond.restype = ctypes.c_int
    lib.nhf_respond.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                                ctypes.c_char_p, ctypes.c_int64]
    lib.nhf_stats.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_long)]
    lib.nhf_stop.argtypes = [ctypes.c_void_p]
    lib.nhf_destroy.argtypes = [ctypes.c_void_p]
    lib.nhf_probe.restype = ctypes.c_int
    if lib.nhf_probe() != 1:
        return None
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native front end is built and loadable."""
    return _load() is not None


class NativeAnomalyHTTPServer:
    """The native-transport twin of server.AnomalyHTTPServer — same
    constructor, routes and payloads; see the module docstring."""

    def __init__(
        self,
        scorer=None,
        meta: Optional[dict] = None,
        host: str = "127.0.0.1",
        port: int = 0,
        score_timeout: float = 60.0,
        models: Optional[dict] = None,
        ready_timeout: float = 10.0,
        max_queue: int = 1024,
        responders: int = 16,
        reloader=None,
    ):
        from ssad_tpu.serving.drift import ScoreTracker

        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native HTTP front end unavailable (g++/build failed or "
                "SSAD_NATIVE=0) — use serving.server.AnomalyHTTPServer"
            )
        if models is None:
            if scorer is None or meta is None:
                raise ValueError(
                    "pass (scorer, meta) or models={name: (scorer, meta)}"
                )
            models = {meta.get("subject") or "default": (scorer, meta)}
        self.models = dict(models)
        if scorer is None and len(self.models) == 1:
            scorer, meta = next(iter(self.models.values()))
        self.scorer = scorer
        self.meta = meta
        self.score_timeout = float(score_timeout)
        self.ready_timeout = float(ready_timeout)
        self.trackers = {
            name: ScoreTracker(baseline=m.get("calibration"))
            for name, (_, m) in self.models.items()
        }
        # enables POST /admin/reload — same semantics as the stdlib
        # front end (server.perform_reload)
        self._reloader = reloader
        self._reload_lock = threading.Lock()
        self._lib = lib
        # 0/None = no transport bound (the C side treats <=0 as "use
        # the built-in default", so unlimited is spelled as a bound no
        # real deployment reaches)
        mq = int(max_queue) if max_queue else (1 << 30)
        self._handle = lib.nhf_create(host.encode(), int(port), mq, 0)
        self._poller: Optional[threading.Thread] = None
        self._pool = ThreadPoolExecutor(max_workers=responders)
        self._stopped = False
        self.port = -1

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "NativeAnomalyHTTPServer":
        port = self._lib.nhf_start(self._handle)
        if port < 0:
            raise OSError("native front end failed to bind")
        self.port = port
        self._poller = threading.Thread(target=self._poll_loop, daemon=True)
        self._poller.start()
        return self

    def stop(self):
        if self._stopped:
            return
        self._stopped = True
        self._lib.nhf_stop(self._handle)
        if self._poller is not None:
            self._poller.join(timeout=10)
        self._pool.shutdown(wait=True)
        self._lib.nhf_destroy(self._handle)
        for sc, _ in self.models.values():
            sc.close()

    def transport_stats(self) -> dict:
        """The C++ side's counters (accepted/parsed/shed/bytes)."""
        out = (ctypes.c_long * 8)()
        self._lib.nhf_stats(self._handle, out)
        keys = ("connections", "requests", "responses", "shed_transport",
                "protocol_errors", "bytes_in", "bytes_out", "queue_depth")
        return dict(zip(keys, [int(v) for v in out]))

    # -- request handling ----------------------------------------------------

    def _respond(self, req_id: int, code: int, payload: dict):
        body = json.dumps(payload).encode("utf-8")
        self._lib.nhf_respond(self._handle, req_id, code, body, len(body))

    def _poll_loop(self):
        reqs = (_NhfReq * 64)()
        while True:
            n = self._lib.nhf_poll(self._handle, reqs, 64, 200)
            if n < 0:
                return
            for i in range(n):
                req_id = reqs[i].id
                try:
                    self._handle_one(reqs[i], req_id)
                except Exception as e:
                    # the per-request guard for the SOLE poller thread:
                    # an uncaught exception here (e.g. a GET helper
                    # racing /admin/reload) would kill the loop and
                    # leave the C++ transport accepting connections
                    # that are never answered — process alive, server
                    # dark.  The stdlib front end gets this isolation
                    # for free from its thread-per-request model.
                    try:
                        self._respond(req_id, 500, {"error": repr(e)})
                    except Exception:
                        pass

    def _handle_one(self, req, req_id: int):
        from ssad_tpu.serving.server import (
            Overloaded, _decode_image, build_healthz, build_readyz,
            build_score_payload, build_stats, want_heatmap,
        )

        method = req.method.decode("latin-1")
        full_path = req.path.decode("latin-1")
        path, _, query = full_path.partition("?")
        if method == "GET":
            if path == "/healthz":
                self._respond(req_id, 200,
                              build_healthz(self.models, self.meta))
            elif path == "/stats":
                self._respond(req_id, 200,
                              build_stats(self.models, self.trackers))
            elif path == "/metrics":
                from ssad_tpu.serving.server import _prometheus_metrics

                text = _prometheus_metrics(self.models, self.trackers)
                body = text.encode("utf-8")
                # /metrics is text/plain; the C++ side only
                # writes application/json — acceptable to every
                # Prometheus scraper (it keys on the body), and
                # not worth a second content type in the ABI
                self._lib.nhf_respond(self._handle, req_id, 200,
                                      body, len(body))
            elif path == "/readyz":
                # the probe scores through every batcher — run
                # it OFF the poller thread so live traffic
                # keeps flowing during the probe
                self._pool.submit(self._readyz, req_id, build_readyz)
            else:
                self._respond(req_id, 404,
                              {"error": f"no route {path}"})
            return
        if method != "POST":
            self._respond(req_id, 404,
                          {"error": f"no route {method} {path}"})
            return
        if path == "/admin/reload":
            # load+warm+swap can take minutes — run it on the
            # responder pool so the poller keeps serving
            self._pool.submit(self._reload, req_id)
            return
        # snapshot: /admin/reload replaces self.models from a
        # responder thread mid-loop
        models = self.models
        if path == "/score":
            if len(models) > 1:
                self._respond(req_id, 400, {
                    "error": "several models are loaded; POST "
                             "/score/<name>",
                    "models": sorted(models),
                })
                return
            name = next(iter(models))
        elif path.startswith("/score/"):
            name = path[len("/score/"):]
            if name not in models:
                self._respond(req_id, 404, {
                    "error": f"no model {name!r}",
                    "models": sorted(models),
                })
                return
        else:
            self._respond(req_id, 404, {"error": f"no route {path}"})
            return
        scorer, meta = models[name]
        # copy out of the C++ buffer BEFORE responding frees it
        body = ctypes.string_at(req.body, req.body_len)
        try:
            image = _decode_image(body, tuple(meta["imsize"]))
        except Exception as e:
            self._respond(req_id, 400, {"error": repr(e)})
            return
        try:
            try:
                pending = scorer.submit(image)
            except RuntimeError as e:
                # the batcher was closed under us by a reload
                # that landed between routing and submit — one
                # retry against the current models
                current = self.models.get(name)
                if "scorer is closed" not in str(e) or current is None:
                    raise
                pending = current[0].submit(image)
        except Overloaded as e:
            self._respond(req_id, 503, {"error": repr(e)})
            return
        except Exception as e:
            self._respond(req_id, 500, {"error": repr(e)})
            return
        self._pool.submit(
            self._finish, req_id, pending, name, meta,
            want_heatmap(query), time.perf_counter(),
            build_score_payload,
        )

    def _readyz(self, req_id: int, build_readyz):
        code, payload = build_readyz(self.models, self.ready_timeout)
        self._respond(req_id, code, payload)

    def _reload(self, req_id: int):
        from ssad_tpu.serving.server import perform_reload

        code, payload = perform_reload(self)
        self._respond(req_id, code, payload)

    def _finish(self, req_id, pending, name, meta, heatmap, t0,
                build_score_payload):
        """Responder-pool side: wait for the batched result, build the
        payload (server.py semantics), observe drift, respond."""
        try:
            if not pending.event.wait(self.score_timeout):
                self._respond(req_id, 504, {"error": "scoring timed out"})
                return
            if pending.error is not None:
                raise pending.error
            result = tuple(r[0] for r in pending.result)
            ms = (time.perf_counter() - t0) * 1e3
            payload, primary = build_score_payload(result, meta, heatmap, ms)
            tracker = self.trackers.get(name)  # may be swapped/gone mid-reload
            if tracker is not None:
                tracker.observe(primary)
            self._respond(req_id, 200, payload)
        except Exception as e:
            self._respond(req_id, 500, {"error": repr(e)})
