"""Hot model reload: POST /admin/reload swaps freshly exported
artifacts into a live server without dropping traffic.

Shared semantics live in serving/server.py `perform_reload`; both the
stdlib and native front ends route to it.  Tested with stub scorers
(pure threading, no JAX): the reloader contract is just
`() -> ({name: (BatchingScorer, meta)}, warmup_s)`, which is exactly
what `cli serve`'s artifact loader returns.

The reference has no serving path (tools.py:310-390 is an offline
predict loop), so the oracle is the stated contract: old program until
the swap, new program after, in-flight requests complete on the old
one, a failed reload leaves the old models serving.
"""

import io
import threading
import time

import numpy as np
import pytest

IMSIZE = (4, 4)


def _npy_body(value: float = 1.0) -> bytes:
    buf = io.BytesIO()
    np.save(buf, np.full(IMSIZE + (3,), value, np.float32))
    return buf.getvalue()


def _scorer_v(offset: float, delay_s: float = 0.0):
    def fn(x):
        if delay_s:
            time.sleep(delay_s)
        s = x.reshape(x.shape[0], -1).sum(axis=1) + offset
        return s, (s > 100).astype(np.int32)

    return fn


def _models(offset: float, delay_s: float = 0.0, batch: int = 2):
    from ssad_tpu.serving.server import BatchingScorer

    meta = {"subject": "m", "mode": "image", "imsize": list(IMSIZE),
            "threshold": float(offset)}
    return {"m": (BatchingScorer(_scorer_v(offset, delay_s), batch=batch,
                                 max_delay_ms=5.0), meta)}


def _server(reloader=None, delay_s: float = 0.0):
    from ssad_tpu.serving.server import AnomalyHTTPServer

    models = _models(0.0, delay_s)
    return AnomalyHTTPServer(models=models, port=0, reloader=reloader).start()


def _client(srv, timeout=30.0):
    from ssad_tpu.serving.client import ServingClient

    return ServingClient(f"http://127.0.0.1:{srv.port}", timeout=timeout)


class TestReload:
    def test_swaps_models_and_closes_old(self):
        srv = _server(reloader=lambda: (_models(1000.0), 3.25))
        old_batcher = srv.models["m"][0]
        try:
            with _client(srv) as c:
                base = c.score_bytes(_npy_body())["score"]
                out = c.reload()
                assert out["reloaded"] == ["m"]
                assert out["warmup_s"] == 3.25
                after = c.score_bytes(_npy_body())["score"]
            assert after == pytest.approx(base + 1000.0)
            assert old_batcher._closed
            # single-model servers also refresh the legacy scorer/meta
            # attributes (the /score fast path and healthz read them)
            assert srv.meta["threshold"] == 1000.0
        finally:
            srv.stop()

    def test_no_reloader_is_404(self):
        from ssad_tpu.serving.client import NoSuchRoute

        srv = _server(reloader=None)
        try:
            with _client(srv) as c:
                with pytest.raises(NoSuchRoute):
                    c.reload()
                # and scoring is untouched
                assert "score" in c.score_bytes(_npy_body())
        finally:
            srv.stop()

    def test_failed_reload_keeps_old_models(self):
        from ssad_tpu.serving.client import ServerFault

        def broken():
            raise RuntimeError("export dir missing")

        srv = _server(reloader=broken)
        try:
            with _client(srv) as c:
                base = c.score_bytes(_npy_body())["score"]
                with pytest.raises(ServerFault) as ei:
                    c.reload()
                assert "previous models still serving" in str(ei.value)
                assert c.score_bytes(_npy_body())["score"] == base
            assert not srv.models["m"][0]._closed
        finally:
            srv.stop()

    def test_inflight_requests_survive_swap(self):
        """A request already inside the old batcher when the swap lands
        completes with the OLD program's answer; requests after the
        swap get the new one."""
        srv = _server(reloader=lambda: (_models(1000.0), 0.0), delay_s=0.4)
        results, errors = {}, []

        def post(tag):
            try:
                with _client(srv) as c:
                    results[tag] = c.score_bytes(_npy_body())["score"]
            except BaseException as e:  # pragma: no cover
                errors.append((tag, e))

        try:
            t = threading.Thread(target=post, args=("inflight",))
            t.start()
            time.sleep(0.15)  # let it enter the old batcher
            with _client(srv, timeout=60) as c:
                c.reload()
            post("after")
            t.join(timeout=30)
            assert not errors
            base = float(np.full(IMSIZE + (3,), 1.0).sum())
            assert results["inflight"] == pytest.approx(base)
            assert results["after"] == pytest.approx(base + 1000.0)
        finally:
            srv.stop()

    def test_concurrent_reload_is_409(self):
        from ssad_tpu.serving.client import ServingError

        gate = threading.Event()

        def slow_reloader():
            gate.wait(timeout=30)
            return _models(1000.0), 0.0

        srv = _server(reloader=slow_reloader)
        codes = []

        def fire():
            try:
                with _client(srv, timeout=60) as c:
                    c.reload()
                codes.append(200)
            except ServingError as e:
                codes.append(e.status)

        try:
            t1 = threading.Thread(target=fire)
            t1.start()
            time.sleep(0.2)  # t1 holds the reload lock at the gate
            t2 = threading.Thread(target=fire)
            t2.start()
            t2.join(timeout=30)
            assert codes == [409]
            gate.set()
            t1.join(timeout=30)
            assert sorted(codes) == [200, 409]
        finally:
            gate.set()
            srv.stop()

    def test_race_submit_after_close_retries(self):
        """score_with_reload_retry: a batcher closed between routing and
        submit gets one retry against the current models."""
        from ssad_tpu.serving.server import score_with_reload_retry

        class FakeServer:
            pass

        new_models = _models(1000.0)
        fs = FakeServer()
        fs.models = new_models
        old = _models(0.0)["m"][0]
        old.close()
        try:
            img = np.full(IMSIZE + (3,), 1.0, np.float32)
            score, _ = score_with_reload_retry(fs, "m", old, img, timeout=10)
            assert score == pytest.approx(img.sum() + 1000.0)
        finally:
            new_models["m"][0].close()


@pytest.mark.skipif(
    "not __import__('ssad_tpu.serving.native_frontend', fromlist=['available']).available()",
    reason="native front end not buildable here",
)
class TestReloadNativeFrontend:
    def test_reload_parity_with_stdlib(self):
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        srv = NativeAnomalyHTTPServer(
            models=_models(0.0), port=0,
            reloader=lambda: (_models(1000.0), 0.0),
        ).start()
        try:
            with _client(srv) as c:
                base = c.score_bytes(_npy_body())["score"]
                out = c.reload()
                assert out["reloaded"] == ["m"]
                deadline = time.time() + 10
                # the swap happens on a responder thread; poll briefly
                while time.time() < deadline:
                    after = c.score_bytes(_npy_body())["score"]
                    if after != base:
                        break
                    time.sleep(0.05)
                assert after == pytest.approx(base + 1000.0)
        finally:
            srv.stop()

    def test_no_reloader_is_404(self):
        from ssad_tpu.serving.client import NoSuchRoute
        from ssad_tpu.serving.native_frontend import NativeAnomalyHTTPServer

        srv = NativeAnomalyHTTPServer(models=_models(0.0), port=0).start()
        try:
            with _client(srv) as c:
                with pytest.raises(NoSuchRoute):
                    c.reload()
        finally:
            srv.stop()
