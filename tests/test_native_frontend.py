"""Native (C++) HTTP front end: protocol + semantics parity with the
stdlib front end (ssad_tpu/native/http_frontend.cpp +
serving/native_frontend.py).

The route payloads are shared code (server.py build_* helpers), so
these tests focus on what the C++ transport owns: HTTP framing,
keep-alive sequencing, protocol errors, transport-level shedding — plus
one end-to-end pass over every route to prove the glue."""

from __future__ import annotations

import http.client
import io
import json
import socket
import threading
import time
import urllib.request

import numpy as np
import pytest

from ssad_tpu.serving.server import BatchingScorer

pytestmark = pytest.mark.skipif(
    not __import__(
        "ssad_tpu.serving.native_frontend", fromlist=["available"]
    ).available(),
    reason="native HTTP front end not buildable here",
)


def _sum_scorer(x):
    s = x.reshape(x.shape[0], -1).sum(axis=1)
    return s, (s > 100).astype(np.int32)


def _npy(img):
    buf = io.BytesIO()
    np.save(buf, img)
    return buf.getvalue()


@pytest.fixture()
def native_server():
    from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

    sc = BatchingScorer(_sum_scorer, batch=4, max_delay_ms=5.0)
    meta = {"mode": "image", "imsize": [8, 8], "threshold": 100.0}
    srv = NativeAnomalyHTTPServer(sc, meta, port=0).start()
    yield srv
    srv.stop()


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read().decode())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return json.loads(r.read().decode())


class TestRoutes:
    def test_score_and_introspection(self, native_server):
        port = native_server.port
        out = _post(port, "/score", _npy(np.full((8, 8, 3), 1.0, np.float32)))
        assert out["score"] == pytest.approx(8 * 8 * 3)
        assert out["label"] == 1 and out["threshold"] == 100.0
        assert _get(port, "/healthz") == {"ok": True, "mode": "image"}
        assert _get(port, "/readyz") == {"ready": True}
        st = _get(port, "/stats")
        assert st["requests"] >= 1 and st["scores"]["recent_n"] >= 1
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=30
        ) as r:
            body = r.read().decode()
        assert "ssad_requests_total" in body
        ts = native_server.transport_stats()
        assert ts["requests"] >= 5 and ts["protocol_errors"] == 0

    def test_client_library_keepalive(self, native_server):
        from ssad_tpu.serving.client import ServingClient

        cl = ServingClient(f"http://127.0.0.1:{native_server.port}")
        a = cl.score(np.full((8, 8, 3), 1.0, np.float32))
        conn = cl._local.conn
        b = cl.score(np.full((8, 8, 3), 0.5, np.float32))
        assert cl._local.conn is conn  # same keep-alive socket
        assert a["score"] == pytest.approx(192.0)
        assert b["score"] == pytest.approx(96.0)
        # keep-alive at the transport: 1 connection, ≥2 requests
        ts = native_server.transport_stats()
        assert ts["connections"] <= 2 and ts["requests"] >= 2

    def test_bad_body_is_400(self, native_server):
        req = urllib.request.Request(
            f"http://127.0.0.1:{native_server.port}/score",
            data=b"not an image", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400

    def test_unknown_routes_are_404(self, native_server):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(native_server.port, "/nope")
        assert exc.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(native_server.port, "/score/ghost", b"x")
        assert exc.value.code == 404

    def test_multi_model_routing(self):
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        def double_scorer(x):
            s = 2 * x.reshape(x.shape[0], -1).sum(axis=1)
            return s, (s > 100).astype(np.int32)

        models = {
            "a": (BatchingScorer(_sum_scorer, batch=2, max_delay_ms=2.0),
                  {"mode": "image", "imsize": [8, 8], "threshold": 1.0}),
            "b": (BatchingScorer(double_scorer, batch=2, max_delay_ms=2.0),
                  {"mode": "image", "imsize": [8, 8], "threshold": 1.0}),
        }
        srv = NativeAnomalyHTTPServer(models=models, port=0).start()
        try:
            body = _npy(np.full((8, 8, 3), 1.0, np.float32))
            assert _post(srv.port, "/score/a", body)["score"] == pytest.approx(192)
            assert _post(srv.port, "/score/b", body)["score"] == pytest.approx(384)
            # bare /score is ambiguous with several models
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/score", data=body, method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=30)
            assert exc.value.code == 400
            st = _get(srv.port, "/stats")
            assert set(st) == {"a", "b"}
        finally:
            srv.stop()

    def test_patch_mode_heatmap(self):
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        def map_scorer(x):
            return (x.mean(axis=-1),)

        sc = BatchingScorer(map_scorer, batch=2, max_delay_ms=5.0)
        srv = NativeAnomalyHTTPServer(
            sc, {"mode": "patch", "imsize": [8, 8]}, port=0
        ).start()
        try:
            img = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
            out = _post(srv.port, "/score?heatmap=1", _npy(img))
            assert out["map_max"] == pytest.approx(float(img.mean(-1).max()), rel=1e-5)
            assert "heatmap_b64" in out
        finally:
            srv.stop()


class TestProtocol:
    """The C++ framing layer: raw-socket cases the stdlib fuzz suite
    covers for the Python front end."""

    def _raw(self, port, payload, recv_until_close=False):
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        s.sendall(payload)
        chunks = []
        s.settimeout(10)
        try:
            while True:
                got = s.recv(65536)
                if not got:
                    break
                chunks.append(got)
                if not recv_until_close and b"\r\n\r\n" in b"".join(chunks):
                    head = b"".join(chunks)
                    # stop once the advertised body is complete
                    hdr, _, rest = head.partition(b"\r\n\r\n")
                    for line in hdr.split(b"\r\n"):
                        if line.lower().startswith(b"content-length:"):
                            need = int(line.split(b":")[1])
                            if len(rest) >= need:
                                s.close()
                                return head
        except socket.timeout:
            pass
        s.close()
        return b"".join(chunks)

    def test_malformed_request_line_is_400(self, native_server):
        out = self._raw(native_server.port, b"GARBAGE\r\n\r\n")
        assert out.startswith(b"HTTP/1.1 400")

    def test_chunked_body_is_411(self, native_server):
        out = self._raw(
            native_server.port,
            b"POST /score HTTP/1.1\r\nHost: x\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n",
        )
        assert out.startswith(b"HTTP/1.1 411")
        assert b"Connection: close" in out

    def test_oversized_body_is_413(self):
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        sc = BatchingScorer(_sum_scorer, batch=2, max_delay_ms=2.0)
        srv = NativeAnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [8, 8], "threshold": 1.0},
            port=0,
        )
        # shrink the body bound via the C ABI create param: rebuild
        srv._lib.nhf_destroy(srv._handle)
        srv._handle = srv._lib.nhf_create(b"127.0.0.1", 0, 1024, 1024)
        srv.start()
        try:
            out = self._raw(
                srv.port,
                b"POST /score HTTP/1.1\r\nHost: x\r\n"
                b"Content-Length: 999999\r\n\r\n",
            )
            assert out.startswith(b"HTTP/1.1 413")
        finally:
            srv.stop()

    def test_expect_100_continue(self, native_server):
        body = _npy(np.full((8, 8, 3), 1.0, np.float32))
        head = (
            f"POST /score HTTP/1.1\r\nHost: x\r\n"
            f"Expect: 100-continue\r\nContent-Length: {len(body)}\r\n\r\n"
        ).encode()
        s = socket.create_connection(("127.0.0.1", native_server.port), timeout=10)
        s.sendall(head)
        first = s.recv(1024)
        assert first.startswith(b"HTTP/1.1 100 Continue")
        s.sendall(body)
        rest = b""
        while b"\r\n\r\n" not in rest or b"score" not in rest:
            got = s.recv(65536)
            if not got:
                break
            rest += got
        assert b"HTTP/1.1 200" in rest and b'"score"' in rest
        s.close()

    def test_pipelined_requests_answered_in_order(self, native_server):
        """Two requests sent back-to-back before any response: the
        transport must answer both, in order (one-in-flight
        sequencing)."""
        b1 = _npy(np.full((8, 8, 3), 1.0, np.float32))
        b2 = _npy(np.full((8, 8, 3), 0.5, np.float32))
        req = b"".join(
            (f"POST /score HTTP/1.1\r\nHost: x\r\nContent-Length: "
             f"{len(b)}\r\n\r\n").encode() + b
            for b in (b1, b2)
        )
        out = self._raw(native_server.port, req, recv_until_close=True)
        bodies = [json.loads(part.partition(b"\r\n\r\n")[0] and
                             part[part.find(b"{"):part.rfind(b"}") + 1] or b"{}")
                  for part in out.split(b"HTTP/1.1 200 OK")[1:]]
        assert len(bodies) == 2
        assert bodies[0]["score"] == pytest.approx(192.0)
        assert bodies[1]["score"] == pytest.approx(96.0)

    def test_request_plus_fin_still_answered(self, native_server):
        """One-shot clients send the request then shutdown(SHUT_WR) in
        one burst.  The transport must parse + answer what arrived
        before the FIN instead of dropping the connection."""
        body = _npy(np.full((8, 8, 3), 1.0, np.float32))
        req = (
            f"POST /score HTTP/1.1\r\nHost: x\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        s = socket.create_connection(("127.0.0.1", native_server.port), timeout=10)
        s.sendall(req)
        s.shutdown(socket.SHUT_WR)  # FIN before any response byte
        s.settimeout(10)
        out = b""
        while True:
            got = s.recv(65536)
            if not got:
                break
            out += got
        s.close()
        assert out.startswith(b"HTTP/1.1 200")
        assert json.loads(out[out.find(b"{"):])["score"] == pytest.approx(192.0)

    def test_negative_content_length_is_400(self, native_server):
        out = self._raw(
            native_server.port,
            b"POST /score HTTP/1.1\r\nHost: x\r\nContent-Length: -5\r\n\r\n",
        )
        assert out.startswith(b"HTTP/1.1 400")

    def test_garbage_content_length_is_400(self, native_server):
        out = self._raw(
            native_server.port,
            b"POST /score HTTP/1.1\r\nHost: x\r\nContent-Length: 12abc\r\n\r\n",
        )
        assert out.startswith(b"HTTP/1.1 400")

    def test_transport_sheds_when_python_is_slow(self):
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        def slow(x):
            time.sleep(0.3)
            return _sum_scorer(x)

        sc = BatchingScorer(slow, batch=1, max_delay_ms=0.1, max_queue=None)
        srv = NativeAnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [8, 8], "threshold": 1.0},
            port=0, max_queue=1,
        ).start()
        # saturate the poller thread so the C++ handoff queue backs up:
        # the poller is busy decoding/submitting while more arrive
        body = _npy(np.full((8, 8, 3), 1.0, np.float32))
        codes = []
        lock = threading.Lock()

        def hit():
            try:
                _post(srv.port, "/score", body)
                with lock:
                    codes.append(200)
            except urllib.error.HTTPError as e:
                with lock:
                    codes.append(e.code)
                e.read()

        try:
            threads = [threading.Thread(target=hit) for _ in range(12)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert all(c in (200, 503) for c in codes)
            assert codes.count(200) >= 1
            # either the transport bound or the batcher bound may shed
            # first; the invariant is bounded admission, not the layer
        finally:
            srv.stop()

    def test_concurrent_burst_no_resets(self, native_server):
        body = _npy(np.full((8, 8, 3), 1.0, np.float32))
        errs = []

        def hit():
            try:
                out = _post(native_server.port, "/score", body)
                assert out["score"] == pytest.approx(192.0)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=hit) for _ in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs

    def test_drift_tracking_via_shared_semantics(self):
        from ssad_tpu.serving.drift import quantile_summary
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        rng = np.random.default_rng(0)
        baseline = quantile_summary(rng.normal(96.0, 2.0, 500))
        sc = BatchingScorer(_sum_scorer, batch=4, max_delay_ms=2.0)
        srv = NativeAnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [8, 8], "threshold": 150.0,
                 "calibration": baseline}, port=0,
        ).start()
        srv.trackers["default"].min_scores = 8
        try:
            body = _npy(np.full((8, 8, 3), 1.0, np.float32))
            for _ in range(8):
                _post(srv.port, "/score", body)
            st = _get(srv.port, "/stats")["scores"]
            assert st["drift_ks"] == pytest.approx(1.0)
            assert st["drift_alert"] is True
        finally:
            srv.stop()


class TestPollerResilience:
    def test_poller_survives_handler_exception(self, native_server,
                                               monkeypatch):
        """An exception inside a route helper (e.g. a GET racing a
        reload) must 500 that ONE request and leave the sole poller
        thread alive — a dead poller means the C++ transport keeps
        accepting connections that are never answered."""
        import ssad_tpu.serving.server as server_mod

        def boom(models, trackers):
            raise KeyError("torn reload snapshot")

        monkeypatch.setattr(server_mod, "build_stats", boom)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(native_server.port, "/stats")
        assert ei.value.code == 500
        monkeypatch.undo()
        # the poller must still answer — on both old and new requests
        assert _get(native_server.port, "/healthz")["ok"] is True
        assert "requests" in _get(native_server.port, "/stats")

    def test_overflow_while_inflight_preserves_ordering(self):
        """An oversized pipelined request arriving while a response is
        still owed must not jump the queue: the in-flight request's 200
        comes first, the 413 after (HTTP/1.1 ordering)."""
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        def slow_sum(x):
            time.sleep(0.5)
            return _sum_scorer(x)

        sc = BatchingScorer(slow_sum, batch=1, max_delay_ms=1.0)
        srv = NativeAnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [8, 8], "threshold": 100.0},
            port=0,
        )
        # shrink max_body via the C ABI create param (same trick as
        # test_oversized_body_is_413): overflow = 1024 + 16K header room
        srv._lib.nhf_destroy(srv._handle)
        srv._handle = srv._lib.nhf_create(b"127.0.0.1", 0, 1024, 1024)
        srv.start()
        try:
            body_a = _npy(np.full((8, 8, 3), 1.0, np.float32))
            req_a = (
                f"POST /score HTTP/1.1\r\nHost: x\r\n"
                f"Content-Length: {len(body_a)}\r\n\r\n"
            ).encode() + body_a
            req_b = (
                b"POST /score HTTP/1.1\r\nHost: x\r\n"
                b"Content-Length: 999999\r\n\r\n" + b"x" * 30000
            )
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
            s.sendall(req_a)
            time.sleep(0.1)  # A is parsed and in flight (slow scorer)
            s.sendall(req_b)  # rbuf blows past max_body while waiting
            s.settimeout(10)
            out = b""
            try:
                while True:
                    got = s.recv(65536)
                    if not got:
                        break
                    out += got
            except socket.timeout:
                pass
            s.close()
            first, _, rest = out.partition(b"\r\n\r\n")
            assert first.startswith(b"HTTP/1.1 200"), out[:200]
            assert b'"score"' in rest
            assert b"HTTP/1.1 413" in rest  # after A's response
            assert out.find(b"200 OK") < out.find(b"413")
        finally:
            srv.stop()


class TestTransportBufferBound:
    def test_pipelined_inlimit_requests_exceeding_rbuf_both_answered(self):
        """Two pipelined requests each within max_body whose combined
        bytes exceed the transport buffer bound (max_body + 16K header
        room) must BOTH get 200s: the rbuf bound pauses reading, it is
        not a request limit (the per-request 413 lives in the parser's
        Content-Length check)."""
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        sc = BatchingScorer(_sum_scorer, batch=1, max_delay_ms=1.0)
        srv = NativeAnomalyHTTPServer(
            sc, {"mode": "image", "imsize": [40, 40], "threshold": 1e9},
            port=0,
        )
        # max_body 20000 > one 19,328-byte (40,40,3) npy body; two
        # pipelined bodies exceed max_body + 16K → the old code 413'd
        srv._lib.nhf_destroy(srv._handle)
        srv._handle = srv._lib.nhf_create(b"127.0.0.1", 0, 1024, 20000)
        srv.start()
        try:
            body = _npy(np.full((40, 40, 3), 0.25, np.float32))
            req = (
                f"POST /score HTTP/1.1\r\nHost: x\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
            s.sendall(req + req)  # one burst, combined > max_body + 16K
            s.settimeout(10)
            out = b""
            try:
                while out.count(b'"score"') < 2:
                    got = s.recv(65536)
                    if not got:
                        break
                    out += got
            except socket.timeout:
                pass
            s.close()
            assert out.count(b"HTTP/1.1 200") == 2, out[:300]
            assert b"413" not in out
        finally:
            srv.stop()
