"""Serving API: real HTTP round-trips against the reference's schema.

Mirrors the reference smoke tests (`test_parallel_t2v_simple.py`,
`test_parallel_t2v.py`): POST a request, poll both status endpoints.
"""

import json
import threading
import time
import urllib.request

import pytest

from mmpl_tpu.serving.server import (ParallelServerConfig, TaskStatus,
                                     create_server)


@pytest.fixture()
def server(tmp_path):
    done = threading.Event()

    def backend(prompt, num_chunks, seed, image=None):
        paths = []
        for i in range(num_chunks):
            p = tmp_path / f"chunk{i}.mp4"
            p.write_bytes(b"fake")
            paths.append(str(p))
        done.set()
        return paths

    cfg = ParallelServerConfig(host="127.0.0.1", port=0,
                               output_folder=str(tmp_path))
    srv = create_server(cfg, backend=backend)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, srv.server_address[1], done
    srv.shutdown()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.status, json.loads(r.read())


def test_health(server):
    _, port, _ = server
    status, body = _get(port, "/health")
    assert status == 200
    assert body["status"] == "healthy"
    assert body["model_loaded"] is True
    assert body["service_type"] == "parallel_t2v"


def test_generate_and_poll(server):
    _, port, done = server
    status, body = _post(port, "/parallel_text_2_video",
                         {"prompt": "a red fox", "num_chunks": 2,
                          "seed": 7, "seqid": "myseq"})
    assert status == 200
    assert body["status"] == TaskStatus.PROCESSING.value
    assert body["seqid"] == "myseq"
    task_id = body["task_id"]

    assert done.wait(timeout=10)
    deadline = time.time() + 10
    rec = None
    while time.time() < deadline:
        _, rec = _get(port, f"/status/{task_id}")
        if rec.get("status") == TaskStatus.SUCCESS.value:
            break
        time.sleep(0.1)
    assert rec["status"] == TaskStatus.SUCCESS.value
    assert len(rec["data"]["video"]) == 2
    assert rec["data"]["text_en"] == "a red fox"

    # the openapi search endpoint resolves by seqid
    _, rec2 = _post(port, "/openapi/task_search", {"seqid": "myseq"})
    assert rec2["status"] == TaskStatus.SUCCESS.value
    assert rec2["data"]["video"] == rec["data"]["video"]


def test_unknown_task_and_missing_prompt(server):
    _, port, _ = server
    _, rec = _get(port, "/status/nope")
    assert rec["code"] == 10404
    assert rec["status"] == "not_found"
    status, rec = _post(port, "/openapi/task_search", {"seqid": "ghost"})
    assert rec["code"] == 10404
    # missing prompt -> 422 like fastapi validation
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/parallel_text_2_video",
        data=json.dumps({"num_chunks": 1}).encode(),
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=10)
        raise AssertionError("expected 422")
    except urllib.error.HTTPError as e:
        assert e.code == 422


def test_failed_backend_reports_failure(tmp_path):
    def backend(prompt, num_chunks, seed, image=None):
        raise RuntimeError("chip on fire")

    cfg = ParallelServerConfig(host="127.0.0.1", port=0,
                               output_folder=str(tmp_path))
    srv = create_server(cfg, backend=backend)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        _, body = _post(port, "/parallel_text_2_video", {"prompt": "x"})
        deadline = time.time() + 10
        rec = None
        while time.time() < deadline:
            _, rec = _get(port, f"/status/{body['task_id']}")
            if rec.get("status") in (TaskStatus.FAILED.value,):
                break
            time.sleep(0.1)
        assert rec["status"] == TaskStatus.FAILED.value
        assert "chip on fire" in rec["message"]
        assert rec["code"] == 10903
    finally:
        srv.shutdown()


def test_i2v_request_passes_image(tmp_path):
    got = {}

    def backend(prompt, num_chunks, seed, image=None):
        got["image"] = image
        return []

    cfg = ParallelServerConfig(host="127.0.0.1", port=0,
                               output_folder=str(tmp_path),
                               service_type="parallel_i2v")
    srv = create_server(cfg, backend=backend)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        _, body = _post(port, "/parallel_i2v",
                        {"prompt": "a boat", "image": "b64://fake"})
        deadline = time.time() + 10
        while "image" not in got and time.time() < deadline:
            time.sleep(0.05)
        assert got.get("image") == "b64://fake"
    finally:
        srv.shutdown()


def test_cover_image_and_aigc_metadata(tmp_path):
    """Cover extraction + AIGC metadata (VERDICT r1 item 5 / reference
    fastapi_parallel_t2v_server.py:124-175,618-653): the task record and
    callback carry cover_image URLs, and the PNG embeds the AIGC JSON."""
    import numpy as np
    from PIL import Image
    from mmpl_tpu.serving.server import (MediaMetadataHandler,
                                         ParallelVideoGenerationService,
                                         VideoProcessor)

    def backend(prompt, num_chunks, seed, image=None):
        paths = []
        for i in range(num_chunks):
            p = str(tmp_path / f"clip{i}.mp4.npy")
            frames = np.full((3, 8, 8, 3), 10 * (i + 1), np.uint8)
            np.save(p, frames)
            paths.append(p)
        return paths

    cfg = ParallelServerConfig(output_folder=str(tmp_path))
    svc = ParallelVideoGenerationService(cfg, backend=backend)
    svc.generate_parallel_video_task(
        {"prompt": "hello", "seqid": "sq1", "num_chunks": 2}, "tid1")
    rec = svc.get_task_status("tid1")
    assert rec["status"] == TaskStatus.SUCCESS.value
    assert len(rec["data"]["video"]) == 2
    assert len(rec["data"]["cover_image"]) == 2

    png = rec["data"]["cover_image"][0]
    img = Image.open(png)
    meta = json.loads(img.text["AIGC"])
    assert meta["ProduceID"] == "sq1" and meta["PropagateID"] == "sq1"
    assert meta["ContentProducer"] == "TeleStudio"

    # first frame content round-trips
    assert np.asarray(img)[0, 0, 0] == 10

    # direct unit: extraction failure is graceful
    bad = str(tmp_path / "bad.mp4")
    open(bad, "wb").write(b"junk")
    assert not VideoProcessor.extract_first_frame(bad,
                                                  str(tmp_path / "c.png"))
    # video metadata without ffmpeg degrades to passthrough
    out = MediaMetadataHandler.write_video_metadata("sq", bad,
                                                    str(tmp_path / "o.mp4"))
    assert out in (bad, str(tmp_path / "o.mp4"))


def test_progressive_chunk_publication(tmp_path):
    """Backends accepting `on_chunk` get per-chunk publication: the task
    record shows artifacts + progress while still PROCESSING (reference
    i2v server appends results chunk-by-chunk under a lock,
    fastapi_parallel_i2v_server.py:706-835)."""
    import numpy as np
    from PIL import Image

    gate = threading.Event()        # blocks the backend after chunk 1
    saw_partial = {}

    def _write_fake_video(p):
        # a real 1-frame gif so cover extraction works
        Image.fromarray(
            np.full((8, 8, 3), 128, np.uint8)).save(p, format="GIF")

    def backend(prompt, num_chunks, seed, image=None, on_chunk=None):
        paths = []
        for i in range(num_chunks):
            p = str(tmp_path / f"c{i}.gif")
            _write_fake_video(p)
            paths.append(p)
            if on_chunk is not None:
                on_chunk(p)
            if i == 0:
                gate.wait(timeout=10)
        return paths

    cfg = ParallelServerConfig(host="127.0.0.1", port=0,
                               output_folder=str(tmp_path))
    srv = create_server(cfg, backend=backend)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        _, body = _post(port, "/parallel_text_2_video",
                        {"prompt": "p", "num_chunks": 2, "seed": 1})
        task_id = body["task_id"]
        # chunk 1 publishes while the backend is still blocked on `gate`
        deadline = time.time() + 10
        while time.time() < deadline:
            _, rec = _get(port, f"/status/{task_id}")
            if rec.get("progress", {}).get("done") == 1:
                saw_partial = rec
                break
            time.sleep(0.05)
        assert saw_partial, "no partial publication observed"
        assert saw_partial["status"] == TaskStatus.PROCESSING.value
        assert len(saw_partial["data"]["video"]) == 1
        assert saw_partial["progress"] == {"done": 1, "total": 2}
        gate.set()
        deadline = time.time() + 10
        rec = None
        while time.time() < deadline:
            _, rec = _get(port, f"/status/{task_id}")
            if rec.get("status") == TaskStatus.SUCCESS.value:
                break
            time.sleep(0.05)
        assert rec["status"] == TaskStatus.SUCCESS.value
        assert len(rec["data"]["video"]) == 2
        assert len(rec["data"]["cover_image"]) == 2
    finally:
        srv.shutdown()


def test_queue_depth_reporting(tmp_path):
    """Capacity model (VERDICT r3 item 8): /health reports queue depth +
    busy state and a PROCESSING task's status carries its FIFO position,
    so a client can tell "busy, k ahead of you" from "idle" (the
    reference's need_wait analogue, fastapi_parallel_t2v_server.py:690)."""
    gate = threading.Event()
    glock = threading.Lock()   # stands in for the backend's gen_lock

    def backend(prompt, num_chunks, seed, image=None):
        with glock:
            gate.wait(timeout=20)
            p = tmp_path / f"{prompt}.mp4"
            p.write_bytes(b"fake")
            return [str(p)]

    cfg = ParallelServerConfig(host="127.0.0.1", port=0,
                               output_folder=str(tmp_path))
    srv = create_server(cfg, backend=backend)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        _, h = _get(port, "/health")
        assert h["queue_depth"] == 0 and h["busy"] is False

        _, b1 = _post(port, "/parallel_text_2_video",
                      {"prompt": "one", "seed": 1})
        deadline = time.time() + 10
        while time.time() < deadline:
            _, h = _get(port, "/health")
            if h["queue_depth"] == 1:
                break
            time.sleep(0.02)
        assert h["queue_depth"] == 1 and h["busy"] is True

        _, b2 = _post(port, "/parallel_text_2_video",
                      {"prompt": "two", "seed": 2})
        deadline = time.time() + 10
        while time.time() < deadline:
            _, h = _get(port, "/health")
            if h["queue_depth"] == 2:
                break
            time.sleep(0.02)
        assert h["queue_depth"] == 2

        # FIFO positions: first request is generating (0), second waits (1)
        _, r1 = _get(port, f"/status/{b1['task_id']}")
        _, r2 = _get(port, f"/status/{b2['task_id']}")
        assert r1["status"] == TaskStatus.PROCESSING.value
        assert r1["queue_position"] == 0
        assert r2["queue_position"] == 1

        gate.set()
        deadline = time.time() + 20
        while time.time() < deadline:
            _, h = _get(port, "/health")
            _, r2 = _get(port, f"/status/{b2['task_id']}")
            if h["queue_depth"] == 0 and \
                    r2.get("status") == TaskStatus.SUCCESS.value:
                break
            time.sleep(0.05)
        assert h["queue_depth"] == 0 and h["busy"] is False
        assert r2["status"] == TaskStatus.SUCCESS.value
        assert "queue_position" not in r2   # only reported while queued
    finally:
        srv.shutdown()
