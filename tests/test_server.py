"""Serving daemon: dynamic micro-batching + HTTP face (server.py).

Coverage: batched dispatches equal direct artifact calls row-for-row;
concurrent submissions coalesce into ONE dispatch; the gt entry routes
through its own queue; the HTTP face serves predict (argmax + gt-verb),
healthz/stats/meta; error paths return 4xx JSON, not stack traces.
"""

import io
import json
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from situation_recognition_tpu.serving import export_inference, load_inference
from situation_recognition_tpu.server import DynamicBatcher, serve_http
from situation_recognition_tpu.train import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def artifact(encoder, tmp_path_factory):
    cfg = TrainerConfig(hidden=64, batch_size=8, backbone="mini",
                        compute_dtype=jnp.float32)
    tr = Trainer(encoder, cfg)
    path = str(tmp_path_factory.mktemp("served") / "artifact")
    export_inference(tr, path, batch_size=4)
    return load_inference(path)


def _windows(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, 256, 256, 3), dtype=np.uint8)


def test_batcher_matches_direct_calls(artifact):
    imgs = _windows(6)
    b = DynamicBatcher(artifact, max_wait_ms=50)
    try:
        futs = [b.submit(imgs[i]) for i in range(6)]
        rows = [f.result(timeout=60) for f in futs]
    finally:
        b.close()

    verb_logits, verb_ids, noun_logits = artifact(imgs)
    for i, row in enumerate(rows):
        assert row["verb_id"] == int(np.asarray(verb_ids)[i])
        np.testing.assert_allclose(row["verb_logits"],
                                   np.asarray(verb_logits)[i],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(row["noun_logits"],
                                   np.asarray(noun_logits)[i],
                                   rtol=1e-5, atol=1e-6)


def test_batcher_coalesces_concurrent_requests(artifact):
    """4 requests inside one wait window must cost ONE artifact dispatch
    (the daemon's whole point: burst traffic amortizes the device call)."""
    imgs = _windows(4, seed=1)
    b = DynamicBatcher(artifact, max_batch=4, max_wait_ms=500)
    try:
        futs = [b.submit(imgs[i]) for i in range(4)]
        for f in futs:
            f.result(timeout=60)
    finally:
        b.close()
    assert b.stats["dispatches"] == 1
    assert b.stats["max_batch_seen"] == 4
    assert b.stats["batched_examples"] == 4


def test_batcher_gt_entry(artifact, encoder):
    imgs = _windows(3, seed=2)
    verbs = np.arange(3, dtype=np.int32) % encoder.get_num_verbs()
    b = DynamicBatcher(artifact, max_wait_ms=50)
    try:
        rows = [b.submit_gt(imgs[i], int(verbs[i])).result(timeout=60)
                for i in range(3)]
    finally:
        b.close()
    want = np.asarray(artifact.gt(imgs, verbs))
    for i, row in enumerate(rows):
        np.testing.assert_allclose(row["noun_logits"], want[i],
                                   rtol=1e-5, atol=1e-6)


def test_batcher_rejects_bad_shapes(artifact):
    b = DynamicBatcher(artifact, max_wait_ms=1)
    try:
        with pytest.raises(ValueError, match="uint8 window"):
            b.submit(np.zeros((224, 224, 3), np.uint8))
        with pytest.raises(ValueError, match="uint8 window"):
            b.submit(np.zeros((256, 256, 3), np.float32))
    finally:
        b.close()


def _post(url, body, timeout=60):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url, timeout=30):
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_server_end_to_end(artifact, encoder):
    from PIL import Image

    httpd = serve_http(artifact, port=0, max_wait_ms=5)  # ephemeral port
    host, port = httpd.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        assert _get(base + "/healthz") == (200, {"status": "ok"})

        status, meta = _get(base + "/meta")
        assert status == 200
        assert meta["batch_size"] == 4
        assert meta["num_verbs"] == encoder.get_num_verbs()
        assert "verb_list" not in meta            # big lists trimmed

        buf = io.BytesIO()
        Image.fromarray(_windows(1, seed=3)[0], "RGB").save(buf, "JPEG")
        jpeg = buf.getvalue()

        status, out = _post(base + "/predict", jpeg)
        assert status == 200
        assert out["verb"] in encoder.verb_list
        assert 0.0 < out["verb_prob"] <= 1.0
        # role slots named from the artifact's roles_per_verb (format v6)
        assert out["roles"]
        assert [r["role"] for r in out["roles"]] == \
            encoder.roles_per_verb[out["verb"]]
        for r in out["roles"]:
            assert 0 <= r["label_id"] < encoder.get_num_labels()

        # gt-verb-conditioned path: given verb, probability 1 (sr.py:249-251)
        verb = encoder.verb_list[0]
        status, out_gt = _post(base + f"/predict?verb={verb}", jpeg)
        assert status == 200
        assert out_gt["verb"] == verb and out_gt["verb_prob"] == 1.0
        assert [r["role"] for r in out_gt["roles"]] == \
            encoder.roles_per_verb[verb]

        # errors: bad body, unknown verb, unknown path — JSON 4xx
        assert _post(base + "/predict", b"not an image")[0] == 400
        assert _post(base + "/predict?verb=notaverb", jpeg)[0] == 400
        assert _get(base + "/nope")[0] == 404

        status, stats = _get(base + "/stats")
        assert status == 200 and stats["dispatches"] >= 2
    finally:
        httpd.shutdown()
        httpd.batcher.close()


def test_http_matches_batcher_numerics(artifact, encoder):
    """The HTTP JSON answer must agree with the raw artifact on the same
    decoded window (decode → host_window → predict is the same path)."""
    from PIL import Image

    from situation_recognition_tpu.data.transforms import host_window

    img = _windows(1, seed=4)[0]
    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(buf, "PNG")   # PNG: lossless
    png = buf.getvalue()

    window = host_window(
        np.asarray(Image.open(io.BytesIO(png)).convert("RGB")), train=False)
    _, verb_ids, _ = artifact(window[None])
    want_vid = int(np.asarray(verb_ids)[0])

    httpd = serve_http(artifact, port=0, max_wait_ms=1)
    host, port = httpd.server_address[:2]
    try:
        status, out = _post(f"http://{host}:{port}/predict", png)
        assert status == 200
        assert out["verb_id"] == want_vid
    finally:
        httpd.shutdown()
        httpd.batcher.close()
