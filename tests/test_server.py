"""HTTP control endpoint: stats, knobs, privacy, admission."""

import json
import urllib.request

import numpy as np
import pytest

from video_stream_segmenetation_tpu import background as bgm
from video_stream_segmenetation_tpu import runtime
from video_stream_segmenetation_tpu.service import Engine
from video_stream_segmenetation_tpu.service.server import ControlServer

FRAME_HW = (48, 64)
MASK_HW = (32, 64)


@pytest.fixture()
def served():
    statics = runtime.PipelineStatics(
        frame_hw=FRAME_HW, mask_hw=MASK_HW, fd_size=64, lmk_size=48,
        background="image", face_path=False,
    )
    eng = Engine(num_streams=2, statics=statics, donate_state=False)
    data = bgm.sample_app_data()
    emp = data.employees["demo"]
    r = bgm.BackgroundRenderer(
        data.templates[emp.default_template_id], emp, canvas_hw=FRAME_HW
    )
    srv = ControlServer(eng, renderers={0: r}).start()
    yield eng, srv
    srv.stop()


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path, body=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body or {}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_stats_and_health(served):
    eng, srv = served
    code, body = _get(srv.port, "/stats")
    assert code == 200 and "fps" in body and "health" in body
    code, body = _get(srv.port, "/healthz")
    assert code == 200 and body["state"] == "ok"


def test_admit_and_knobs_roundtrip(served, rng):
    eng, srv = served
    code, body = _post(srv.port, "/streams")
    assert code == 200
    slot = body["slot"]
    code, _ = _post(srv.port, f"/streams/{slot}/knobs", {"gamma": 1.9, "use_bilateral": False})
    assert code == 200
    eng.process((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    assert float(eng.knobs.gamma[slot]) == pytest.approx(1.9)
    code, _ = _post(srv.port, f"/streams/{slot}/reset")
    assert code == 200
    eng.process((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    assert float(eng.knobs.gamma[slot]) == pytest.approx(0.4)


def test_unknown_knob_rejected(served):
    _, srv = served
    code, body = _post(srv.port, "/streams/0/knobs", {"EMA_WRONG": 1})
    assert code == 400 and "unknown knobs" in body["error"]


def test_privacy_updates_background(served):
    eng, srv = served
    before = np.asarray(eng.backgrounds[0]).copy()
    code, body = _post(srv.port, "/streams/0/privacy", {"level": "high"})
    assert code == 200
    after = np.asarray(eng.backgrounds[0])
    assert not np.array_equal(before, after)  # more layers rendered
    # stream without a renderer -> 409
    code, _ = _post(srv.port, "/streams/1/privacy", {"level": "low"})
    assert code == 409


def test_per_stream_stats(served, rng):
    eng, srv = served
    eng.process((rng.random((2, *FRAME_HW, 3)) * 255).astype(np.uint8))
    code, body = _get(srv.port, "/streams")
    assert code == 200
    assert len(body["streams"]) == 2
    assert body["streams"][0]["frames"] >= 1
    assert {"slot", "active", "frames", "face_affine"} <= set(body["streams"][0])


def test_404s(served):
    _, srv = served
    code, _ = _get(srv.port, "/nope")
    assert code == 404
    code, _ = _post(srv.port, "/streams/99/knobs", {"gamma": 1})
    assert code == 404


def test_background_endpoint(served):
    """POST /streams/<id>/background: solid color, template re-render,
    raw image rows (the settings panel's background selector,
    script.ts:82-111)."""
    eng, srv = served
    before = np.asarray(eng.backgrounds[0]).copy()
    code, body = _post(srv.port, "/streams/0/background",
                       {"color": [10, 200, 30]})
    assert code == 200 and body["ok"]
    after = np.asarray(eng.backgrounds[0])
    assert (after != before).any()

    # template switch through the renderer
    data = bgm.sample_app_data()
    tid = list(data.templates)[0]
    code, body = _post(srv.port, "/streams/0/background",
                       {"template_id": tid})
    assert code == 200 and body["ok"]

    # unknown template -> 400
    code, _ = _post(srv.port, "/streams/0/background",
                    {"template_id": "nope"})
    assert code == 400
