"""mtvaf-serve surface: run_config.json → load_predictor → HTTP serving."""

import json
import threading
import urllib.request

import pytest

from mtvaf_tpu.cli.serve_main import build_app
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.serve import BatchingServer


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """One tiny CLI training run (writes run_config.json + best_model.npz)."""
    from mtvaf_tpu.cli.main import main
    from mtvaf_tpu.data.synthetic import make_crf_files, make_vocab_file
    from mtvaf_tpu.data.tokenization import load_vocab

    tmp = tmp_path_factory.mktemp("serve_http")
    root = tmp / "data"
    base = root / "twitter2015" / "twitter2015"
    base.mkdir(parents=True)
    merged = {}
    for mode, fname in (("train", "train.txt"), ("dev", "valid.txt"),
                        ("test", "test.txt")):
        make_crf_files(str(base / fname), str(tmp / f"anp_{mode}.json"), 8,
                       seed=hash(mode) % 100, num_anp=8)
        merged.update(json.load(open(tmp / f"anp_{mode}.json")))
    (root / "ANP_data").mkdir()
    json.dump(merged, open(root / "ANP_data" / "image_output2015.json", "w"))
    bert_dir = tmp / "bert"
    bert_dir.mkdir()
    make_vocab_file(str(bert_dir / "vocab.txt"))

    save = tmp / "out"
    vocab_size = len(load_vocab(str(bert_dir / "vocab.txt")))
    main(["--dataset_name", "twitter2015", "--do_train",
          "--bert_name", str(bert_dir), "--num_epochs", "1",
          "--eval_begin_epoch", "1", "--train_batch_size", "4",
          "--eval_batch_size", "4", "--max_seq", "32",
          "--save_path", str(save), "--data_root", str(root), "--no_bf16"],
         bert_cfg_override=BertConfig.tiny(vocab_size=vocab_size))
    return save


def test_run_config_written_and_load_predictor(trained_run):
    from mtvaf_tpu.infer import CrfPredictor, load_predictor

    meta = json.load(open(trained_run / "run_config.json"))
    assert meta["config"]["dataset_name"] == "twitter2015"
    assert meta["bert_config"]["hidden_size"] == 32       # the tiny override

    predictor = load_predictor(str(trained_run))
    assert isinstance(predictor, CrfPredictor)
    out = predictor.predict(["the pizza was great but service slow"])
    assert len(out) == 1


def _http(url, data=None):
    req = urllib.request.Request(
        url, data=None if data is None else json.dumps(data).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_endpoints(trained_run):
    from http.server import ThreadingHTTPServer

    from mtvaf_tpu.infer import load_predictor

    predictor = load_predictor(str(trained_run))
    with BatchingServer(predictor, max_batch=4, max_wait_ms=5.0) as server:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_app(server))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            code, body = _http(f"{base}/healthz")
            assert code == 200 and body == {"ok": True}

            code, body = _http(f"{base}/predict",
                               {"sentences": ["great pizza", "bad battery"]})
            assert code == 200
            assert len(body["results"]) == 2

            code, body = _http(f"{base}/stats")
            assert code == 200 and body["served"] == 2

            code, body = _http(f"{base}/predict", {"wrong": 1})
            assert code == 400

            code, body = _http(f"{base}/nope")
            assert code == 404
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_http_predict_with_images():
    """Prefix predictor over HTTP: base64 images flow through the eval
    transform into visual guides; null entries run text-only.  A second
    server over an ``image_dtype='uint8'`` predictor (quarter transfer
    bytes, on-device re-normalize) must return identical results — the
    decoded JPEG pixels are uint8-origin, so the round-trip is exact."""
    import base64
    import io
    from http.server import ThreadingHTTPServer

    import jax
    import numpy as np
    from PIL import Image

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.synthetic import make_vocab_file
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.infer import CrfPredictor
    from mtvaf_tpu.nn.models import init_crf_model_params
    from mtvaf_tpu.nn.resnet import init_resnet_params

    import tempfile, os
    d = tempfile.mkdtemp()
    make_vocab_file(os.path.join(d, "vocab.txt"))
    tok = FullTokenizer(os.path.join(d, "vocab.txt"))
    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bc = BertConfig.tiny(vocab_size=len(tok.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bc)
    pred = CrfPredictor(cfg, bc, params, tok,
                        resnet_params=init_resnet_params(
                            jax.random.PRNGKey(1), depth=18))

    buf = io.BytesIO()
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 48, 3), np.uint8)
    ).save(buf, format="JPEG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    with BatchingServer(pred, max_batch=2, max_wait_ms=10.0) as server:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_app(server))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            base = f"http://127.0.0.1:{port}"
            code, body = _http(f"{base}/predict",
                               {"sentences": ["great pizza", "slow service"],
                                "images": [b64, None]})
            assert code == 200 and len(body["results"]) == 2
            fp32_results = body["results"]

            code, body = _http(f"{base}/predict",
                               {"sentences": ["x"], "images": [b64, b64]})
            assert code == 400          # misaligned images rejected
        finally:
            httpd.shutdown()
            httpd.server_close()

    pred_u8 = CrfPredictor(cfg, bc, params, tok,
                           resnet_params=init_resnet_params(
                               jax.random.PRNGKey(1), depth=18),
                           image_dtype="uint8")
    with BatchingServer(pred_u8, max_batch=2, max_wait_ms=10.0) as server:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_app(server))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            code, body = _http(f"http://127.0.0.1:{port}/predict",
                               {"sentences": ["great pizza", "slow service"],
                                "images": [b64, None]})
            assert code == 200 and body["results"] == fp32_results
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_http_with_batch_shape_ladder(trained_run):
    """The mtvaf-serve config surface: a laddered server behind HTTP —
    warmup compiles every rung, a single request rides the bottom rung
    and a burst coalesces onto larger rungs."""
    from http.server import ThreadingHTTPServer

    from mtvaf_tpu.infer import load_predictor

    predictor = load_predictor(str(trained_run))
    with BatchingServer(predictor, batch_shapes=(1, 4),
                        max_wait_ms=5.0) as server:
        server.warmup()
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_app(server))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            base = f"http://127.0.0.1:{port}"
            code, body = _http(f"{base}/predict", {"sentences": ["solo"]})
            assert code == 200 and len(body["results"]) == 1
            code, body = _http(
                f"{base}/predict",
                {"sentences": [f"s{i} pizza" for i in range(6)]})
            assert code == 200 and len(body["results"]) == 6
            code, body = _http(f"{base}/stats")
            # solo + burst (warmup drives the predictor directly and does
            # not count as served requests)
            assert code == 200 and body["served"] == 7
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_http_multi_replica(trained_run):
    """HTTP chain over devices=[...]: concurrent posts spread across
    replica workers and results match the single predictor."""
    from http.server import ThreadingHTTPServer

    import jax

    from mtvaf_tpu.infer import load_predictor

    devices = jax.local_devices()[:2]
    assert len(devices) == 2                    # conftest forces 8 virtual
    predictor = load_predictor(str(trained_run))
    sents = [f"multi replica sentence {i}" for i in range(16)]
    want = {s: r for s, r in zip(sents, predictor.predict_many(
        sents, batch_size=4))}
    with BatchingServer(predictor, max_batch=4, max_wait_ms=2.0,
                        devices=devices) as server:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_app(server))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            got = {}
            lock = threading.Lock()

            def hit(s):
                code, body = _http(f"http://127.0.0.1:{port}/predict",
                                   {"sentences": [s]})
                assert code == 200
                with lock:
                    got[s] = body["results"][0]
            threads = [threading.Thread(target=hit, args=(s,))
                       for s in sents]
            for x in threads:
                x.start()
            for x in threads:
                x.join()
            code, stats = _http(f"http://127.0.0.1:{port}/stats")
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/metrics", timeout=30) as r:
                metrics = r.read().decode()
                assert r.headers["Content-Type"].startswith("text/plain")
        finally:
            httpd.shutdown()
            httpd.server_close()
    assert "mtvaf_served_total 16" in metrics
    assert 'mtvaf_replica_batches_total{replica="0"}' in metrics
    assert code == 200
    assert stats["replicas"] == 2 and stats["served"] == 16
    assert sum(stats["replica_batches"]) == stats["batches"]
    # JSON round-trips the (term, polarity) tuples as lists
    assert got == {s: [[term, pol] for term, pol in r]
                   for s, r in want.items()}


def test_prometheus_exposition_format():
    from mtvaf_tpu.cli.serve_main import _prometheus

    text = _prometheus({"served": 42, "replicas": 2, "batches": 7,
                        "mean_batch": 6.0, "p50_ms": 31.0, "p95_ms": 40.0,
                        "p99_ms": 55.0, "replica_batches": [4, 3]})
    assert "mtvaf_served_total 42" in text
    assert "mtvaf_replicas 2" in text
    assert 'mtvaf_latency_ms{quantile="0.5"} 31.0' in text
    assert 'mtvaf_replica_batches_total{replica="1"} 3' in text
    assert text.endswith("\n")
    # every non-comment line is "name{labels} value"
    for line in text.strip().splitlines():
        if not line.startswith("#"):
            name, value = line.rsplit(" ", 1)
            float(value)
    # idle server (no batches yet) still renders
    idle = _prometheus({"served": 0, "replicas": 1})
    assert "mtvaf_served_total 0" in idle and "quantile" not in idle


def test_http_serving_a_frozen_bundle(trained_run, tmp_path):
    """mtvaf-serve --bundle: export the run, rebuild the predictor from
    the bundle alone (tokenizer from the manifest's bert_name), serve it
    over HTTP, and match the run-dir predictor's results."""
    from http.server import ThreadingHTTPServer

    from mtvaf_tpu.export import export_predictor, load_exported_predictor
    from mtvaf_tpu.infer import load_predictor

    live = load_predictor(str(trained_run))
    bundle = str(tmp_path / "bundle")
    export_predictor(live, bundle, batch_sizes=(4,), platforms=("cpu",),
                     bake_weights=False)
    served = load_exported_predictor(bundle)       # tokenizer from manifest
    with pytest.raises(ValueError, match="pin their device placement"):
        served.to_device(None)

    sents = ["great pizza", "bad battery", "slow service"]
    want = live.predict(sents + [sents[-1]])[:3]
    with BatchingServer(served, max_batch=4, max_wait_ms=5.0) as server:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_app(server))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            code, body = _http(f"http://127.0.0.1:{port}/predict",
                               {"sentences": sents})
            assert code == 200
            assert body["results"] == [[list(p) for p in r] for r in want]
        finally:
            httpd.shutdown()
            httpd.server_close()


def test_bundle_rejects_multi_device_flag():
    """--bundle + --serve_devices fails at flag-parse time (frozen programs
    pin their placement), before any bundle load is attempted."""
    from mtvaf_tpu.cli.serve_main import main

    with pytest.raises(SystemExit, match="single-device"):
        main(["--bundle", "/nonexistent", "--serve_devices", "auto"])


def test_bundle_rejects_image_dtype_flag():
    """--bundle + --image_dtype fails at flag-parse time: frozen programs
    pin their image transfer dtype at export (manifest image_dtype)."""
    from mtvaf_tpu.cli.serve_main import main

    with pytest.raises(SystemExit, match="image_dtype"):
        main(["--bundle", "/nonexistent", "--image_dtype", "float16"])


def test_http_429_when_queue_full():
    """Overload maps QueueFull to HTTP 429 (with Retry-After) and the
    rejection counter reaches /stats and /metrics."""
    import time
    from http.server import ThreadingHTTPServer

    class _SlowFake:
        def predict(self, sentences, images=None, aux_images=None):
            time.sleep(0.3)
            return [[(s, "POS")] for s in sentences]

    with BatchingServer(_SlowFake(), max_batch=1, max_wait_ms=1.0,
                        max_queue=1) as server:
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_app(server))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"
        try:
            codes = []
            threads = [threading.Thread(
                target=lambda i=i: codes.append(_http(
                    f"{base}/predict", {"sentences": [f"s{i}"]})[0]))
                for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert 429 in codes and 200 in codes
            assert set(codes) <= {200, 429}

            code, body = _http(f"{base}/stats")
            assert code == 200 and body["rejected"] >= 1

            req = urllib.request.Request(f"{base}/metrics")
            with urllib.request.urlopen(req, timeout=30) as r:
                text = r.read().decode()
            assert "mtvaf_rejected_total" in text
        finally:
            httpd.shutdown()
            httpd.server_close()
