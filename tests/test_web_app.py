"""The stdlib web GUI actually serves requests — unlike the streamlit app
(streamlit isn't installable here, tests/test_gui_smoke.py covers its wiring
under a stub), this one runs end-to-end: real HTTP server, real tiny
predictors, every action exercised through POST /api/<action>."""

import base64
import io
import json
import threading
import urllib.request

import pytest
from PIL import Image, ImageDraw


@pytest.fixture(scope="module")
def server():
    from surya_tpu.scripts.web_app import make_server

    srv = make_server(port=0, tiny=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _url(server, path):
    return f"http://127.0.0.1:{server.server_address[1]}{path}"


def _post(server, action, req):
    data = json.dumps(req).encode()
    r = urllib.request.Request(
        _url(server, f"/api/{action}"), data=data, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(r) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _image_req(**extra):
    img = Image.new("RGB", (400, 300), "white")
    ImageDraw.Draw(img).text((20, 20), "hello web", fill="black", font_size=28)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return {"file_b64": base64.b64encode(buf.getvalue()).decode(), "filename": "page.png", **extra}


def test_index_and_health(server):
    with urllib.request.urlopen(_url(server, "/")) as resp:
        assert resp.status == 200
        assert b"surya-tpu" in resp.read()
    with urllib.request.urlopen(_url(server, "/healthz")) as resp:
        assert json.loads(resp.read()) == {"ok": True}


def test_detect_action(server):
    status, out = _post(server, "detect", _image_req())
    assert status == 200
    assert out["image_b64"]
    assert "bboxes" in out["result"]
    # the annotated image decodes back to a PNG of the input size
    img = Image.open(io.BytesIO(base64.b64decode(out["image_b64"])))
    assert img.size == (400, 300)


def test_layout_action(server):
    status, out = _post(server, "layout", _image_req())
    assert status == 200
    assert "bboxes" in out["result"]
    for box in out["result"]["bboxes"]:
        assert {"label", "position", "top_k"} <= set(box)


def test_ocr_action_skip_detection(server):
    status, out = _post(server, "ocr", _image_req(skip_text_detection=True))
    assert status == 200
    assert "text_lines" in out["result"]
    assert isinstance(out["text"], str)
    assert out["word_boxes_b64"]


def test_table_action_whole_image(server):
    status, out = _post(server, "table", _image_req(skip_table_detection=True))
    assert status == 200
    assert out["n_tables"] == 1
    assert isinstance(out["result"], list) and "cells" in out["result"][0]


def test_ocr_error_requires_pdf(server):
    status, out = _post(server, "ocr_error", _image_req())
    assert status == 400
    assert "PDF" in out["error"]


def test_unknown_action_404(server):
    status, out = _post(server, "nonsense", _image_req())
    assert status == 404


def test_malformed_request_answers_500(server):
    status, out = _post(server, "detect", {"file_b64": "!!!not-base64!!!"})
    assert status == 500
    assert "error" in out


def test_bad_content_length_rejected(server):
    """Negative or non-numeric Content-Length must 400 BEFORE any body read
    (a -1 length would otherwise pin the handler thread in read(-1)), and an
    oversized declared length must 413 without allocating."""
    import http.client

    host, port = server.server_address[:2]
    for value, expect in (("-1", 400), ("nonsense", 400), (str(200 * 1024 * 1024), 413)):
        conn = http.client.HTTPConnection(host, port, timeout=10)
        try:
            conn.putrequest("POST", "/api/detect")
            conn.putheader("Content-Type", "application/json")
            conn.putheader("Content-Length", value)
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == expect, (value, resp.status)
        finally:
            conn.close()
