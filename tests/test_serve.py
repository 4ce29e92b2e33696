"""Online serving tests: dynamic batching, ordering, padding, failure paths."""

import threading
import time

import jax
import numpy as np
import pytest

from mtvaf_tpu.core.config import Config
from mtvaf_tpu.data.synthetic import make_vocab_file
from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.infer import CrfPredictor
from mtvaf_tpu.nn.bert import BertConfig
from mtvaf_tpu.nn.models import init_crf_model_params
from mtvaf_tpu.serve import BatchingServer


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    p = tmp_path_factory.mktemp("v") / "vocab.txt"
    make_vocab_file(str(p))
    return FullTokenizer(str(p))


@pytest.fixture(scope="module")
def predictor(tokenizer):
    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False)
    bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
    params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
    return CrfPredictor(cfg, bert_cfg, params, tokenizer)


class _RecordingPredictor:
    """Deterministic fake: records batch sizes, echoes per-sentence tags."""

    def __init__(self, delay_s=0.0, fail_on=None):
        self.calls = []
        self.delay_s = delay_s
        self.fail_on = fail_on

    def predict(self, sentences, images=None, aux_images=None):
        self.calls.append(len(sentences))
        if self.fail_on is not None and any(
                self.fail_on in s for s in sentences):
            raise ValueError("boom")
        if self.delay_s:
            time.sleep(self.delay_s)
        return [[(s, "POS")] for s in sentences]


def test_results_match_and_order_preserved():
    fake = _RecordingPredictor()
    with BatchingServer(fake, max_batch=4, max_wait_ms=10.0) as server:
        futs = [server.submit(f"sentence {i}") for i in range(10)]
        results = [f.result(timeout=10) for f in futs]
    for i, res in enumerate(results):
        assert res == [(f"sentence {i}", "POS")]
    # every device call saw the full padded batch shape
    assert set(fake.calls) == {4}


def test_batches_coalesce_under_load():
    fake = _RecordingPredictor(delay_s=0.05)
    with BatchingServer(fake, max_batch=8, max_wait_ms=2.0) as server:
        futs = [server.submit(f"s{i}") for i in range(32)]
        [f.result(timeout=30) for f in futs]
        stats = server.stats()
    assert stats["served"] == 32
    # while one batch is on the "device", the rest of the queue coalesces
    assert stats["mean_batch"] > 1.5
    assert stats["batches"] < 32


def test_partial_batch_launches_after_max_wait():
    fake = _RecordingPredictor()
    with BatchingServer(fake, max_batch=64, max_wait_ms=20.0) as server:
        t0 = time.perf_counter()
        res = server.predict("lonely request")
        dt = time.perf_counter() - t0
    assert res == [("lonely request", "POS")]
    assert dt < 5.0          # launched on the wait timer, not on batch-full


def test_predictor_errors_resolve_futures():
    fake = _RecordingPredictor(fail_on="bad")
    with BatchingServer(fake, max_batch=2, max_wait_ms=5.0) as server:
        good = server.submit("fine")
        bad = server.submit("bad apple")
        with pytest.raises(ValueError):
            bad.result(timeout=10)
        # the failing batch resolves exceptionally; later batches still work
        assert good.exception(timeout=10) is not None \
            or good.result(timeout=10)
        ok = server.submit("fine again")
        assert ok.result(timeout=10) == [("fine again", "POS")]


def test_submit_after_close_raises():
    fake = _RecordingPredictor()
    server = BatchingServer(fake, max_batch=2, max_wait_ms=1.0)
    server.close()
    with pytest.raises(RuntimeError):
        server.submit("late")


def test_concurrent_submitters():
    fake = _RecordingPredictor(delay_s=0.01)
    results = {}

    def client(cid, server):
        futs = [(i, server.submit(f"c{cid}-{i}")) for i in range(5)]
        results[cid] = [(i, f.result(timeout=30)) for i, f in futs]

    with BatchingServer(fake, max_batch=8, max_wait_ms=2.0) as server:
        threads = [threading.Thread(target=client, args=(c, server))
                   for c in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
    for cid, pairs in results.items():
        for i, res in pairs:
            assert res == [(f"c{cid}-{i}", "POS")]


def test_real_predictor_end_to_end(predictor):
    """Server results == direct predictor results on the same sentences."""
    sents = ["the pizza was great but service slow", "bad battery",
             "nice view from the room"]
    want = predictor.predict(sents + [sents[-1]])[:3]   # padded batch of 4
    with BatchingServer(predictor, max_batch=4, max_wait_ms=50.0) as server:
        futs = [server.submit(s) for s in sents]
        got = [f.result(timeout=120) for f in futs]
    assert got == want
    stats = server.stats()
    assert stats["served"] == 3 and stats["p50_ms"] > 0


class _PipelinedFake:
    """Fake with the dispatch/collect split; records max in-flight depth."""

    def __init__(self, collect_delay_s=0.02):
        self.collect_delay_s = collect_delay_s
        self._inflight = 0
        self._max_inflight = 0
        self._lock = threading.Lock()

    def dispatch(self, sentences, images=None, aux_images=None):
        with self._lock:
            self._inflight += 1
            self._max_inflight = max(self._max_inflight, self._inflight)
        return list(sentences)

    def collect(self, handle):
        time.sleep(self.collect_delay_s)
        with self._lock:
            self._inflight -= 1
        return [[(s, "POS")] for s in handle]


def test_pipelined_results_and_depth_bound():
    fake = _PipelinedFake()
    with BatchingServer(fake, max_batch=2, max_wait_ms=1.0,
                        pipeline_depth=3) as server:
        futs = [server.submit(f"p{i}") for i in range(20)]
        results = [f.result(timeout=30) for f in futs]
    for i, res in enumerate(results):
        assert res == [(f"p{i}", "POS")]
    assert fake._max_inflight <= 3
    # with slow collects and a fast queue, the pipeline actually filled
    assert fake._max_inflight >= 2


class _GatedPipelinedFake:
    """dispatch/collect fake whose collects block on a gate — lets a test
    hold the pipeline at a known depth and watch the take policy."""

    def __init__(self):
        self.calls = []                  # dispatched batch sizes, in order
        self.gate = threading.Event()

    def dispatch(self, sentences, images=None, aux_images=None):
        self.calls.append(len(sentences))
        return list(sentences)

    def collect(self, handle):
        assert self.gate.wait(timeout=30)
        return [[(s, "POS")] for s in handle]


def _wait_until(cond, timeout=10.0):
    deadline = time.perf_counter() + timeout
    while time.perf_counter() < deadline:
        if cond():
            return True
        time.sleep(0.002)
    return cond()


def test_partial_batches_hold_while_pipeline_busy():
    """Saturation fill policy: with partial_inflight batches already in
    flight, an aged below-top-rung take holds until the queue fills the
    top rung (or a slot frees); full batches still dispatch."""
    fake = _GatedPipelinedFake()
    with BatchingServer(fake, batch_shapes=(2, 8), max_wait_ms=15.0,
                        pipeline_depth=4) as server:   # partial_inflight=2
        futs = [server.submit(f"a{i}") for i in range(2)]
        assert _wait_until(lambda: fake.calls == [2])
        futs += [server.submit(f"b{i}") for i in range(2)]
        assert _wait_until(lambda: fake.calls == [2, 2])
        # two partials in flight (gate closed): an aged third partial holds
        futs += [server.submit(f"c{i}") for i in range(3)]
        time.sleep(0.08)                 # >> max_wait: eager policy would
        assert fake.calls == [2, 2]      # have dispatched a padded rung
        # the queue reaching the top rung dispatches FULL despite the holds
        futs += [server.submit(f"d{i}") for i in range(5)]
        assert _wait_until(lambda: fake.calls == [2, 2, 8])
        fake.gate.set()                  # drain
        results = [f.result(timeout=30) for f in futs]
    sents = (["a0", "a1"] + ["b0", "b1"] + [f"c{i}" for i in range(3)]
             + [f"d{i}" for i in range(5)])
    assert results == [[(s, "POS")] for s in sents]
    assert server.stats()["served"] == 12


def test_partial_batch_dispatches_when_slot_frees():
    """A held partial take dispatches as soon as a collect frees a slot —
    no new submits required."""
    fake = _GatedPipelinedFake()
    with BatchingServer(fake, batch_shapes=(2, 8), max_wait_ms=15.0,
                        pipeline_depth=4) as server:
        futs = [server.submit(f"x{i}") for i in range(2)]   # 2 partials fly
        assert _wait_until(lambda: fake.calls == [2])
        futs += [server.submit(f"x{i}") for i in range(2, 4)]
        assert _wait_until(lambda: fake.calls == [2, 2])
        futs += [server.submit("held")]                     # aged, held
        time.sleep(0.05)
        assert fake.calls == [2, 2]
        fake.gate.set()                  # collects complete -> slots free
        assert _wait_until(lambda: len(fake.calls) == 3)
        assert fake.calls[2] == 2        # the held single rode rung 2
        [f.result(timeout=30) for f in futs]


def test_partial_inflight_validation_and_eager_override():
    fake = _RecordingPredictor()
    with pytest.raises(ValueError):
        BatchingServer(fake, partial_inflight=0)
    # partial_inflight >= pipeline_depth restores the eager policy: the
    # third aged single dispatches even with two batches already in flight
    gated = _GatedPipelinedFake()
    with BatchingServer(gated, batch_shapes=(1, 8), max_wait_ms=1.0,
                        pipeline_depth=3, partial_inflight=3) as server:
        futs = []
        for i in range(3):
            futs.append(server.submit(f"e{i}"))
            assert _wait_until(lambda: len(gated.calls) == i + 1)
        assert gated.calls == [1, 1, 1]
        gated.gate.set()
        [f.result(timeout=30) for f in futs]


def test_batch_shape_ladder_picks_smallest_rung():
    """Each take runs at the smallest compiled rung >= its size; the device
    only ever sees ladder shapes."""
    fake = _RecordingPredictor(delay_s=0.02)
    with BatchingServer(fake, max_wait_ms=2.0,
                        batch_shapes=(2, 4, 8)) as server:
        # a lone request must ride the bottom rung, not the top
        assert server.predict("solo") == [("solo", "POS")]
        assert fake.calls[0] == 2
        # a burst coalesces into top-rung batches
        futs = [server.submit(f"s{i}") for i in range(24)]
        results = [f.result(timeout=30) for f in futs]
    for i, res in enumerate(results):
        assert res == [(f"s{i}", "POS")]
    assert set(fake.calls) <= {2, 4, 8}
    assert max(fake.calls) == 8          # saturation reached the top rung


def test_warmup_compiles_every_rung():
    fake = _RecordingPredictor()
    with BatchingServer(fake, batch_shapes=(1, 4, 16)) as server:
        server.warmup()
    assert fake.calls == [1, 4, 16]


# ----------------------------------------------------- multi-device replicas


class _ReplicaFake(_RecordingPredictor):
    """Fake whose to_device() returns a child recorder tagged by device."""

    def __init__(self, delay_s=0.0):
        super().__init__(delay_s=delay_s)
        self.children = []

    def to_device(self, device):
        child = _RecordingPredictor(delay_s=self.delay_s)
        child.device = device
        self.children.append(child)
        return child


def test_replicated_workers_share_the_queue():
    """devices=[...] builds one replica + worker per device; under load with
    slow replicas, the spillover batches land on the other workers."""
    fake = _ReplicaFake(delay_s=0.03)
    with BatchingServer(fake, max_batch=4, max_wait_ms=2.0,
                        devices=["d0", "d1", "d2"]) as server:
        futs = [server.submit(f"r{i}") for i in range(48)]
        results = [f.result(timeout=30) for f in futs]
    for i, res in enumerate(results):
        assert res == [(f"r{i}", "POS")]
    assert len(fake.children) == 3
    assert [c.device for c in fake.children] == ["d0", "d1", "d2"]
    stats = server.stats()
    assert stats["replicas"] == 3
    assert stats["served"] == 48
    # 12 batches of work against a 30 ms-per-batch replica: one worker
    # alone cannot have drained the queue
    busy = [n for n in stats["replica_batches"] if n > 0]
    assert len(busy) >= 2
    assert sum(stats["replica_batches"]) == stats["batches"]


def test_replica_warmup_touches_every_replica():
    fake = _ReplicaFake()
    with BatchingServer(fake, batch_shapes=(1, 4),
                        devices=["a", "b"]) as server:
        server.warmup()
    for child in fake.children:
        assert sorted(child.calls) == [1, 4]
    assert fake.calls == []              # the template predictor never runs


def test_real_predictor_replicated_across_devices(predictor):
    """End-to-end over real local devices: per-replica params live on
    distinct devices and results match the single-device predictor."""
    devices = jax.local_devices()[:4]
    if len(devices) < 2:
        pytest.skip("needs >=2 local devices")
    sents = [f"review number {i} was great" for i in range(32)]
    want = predictor.predict_many(sents, batch_size=4)
    with BatchingServer(predictor, max_batch=4, max_wait_ms=2.0,
                        devices=devices) as server:
        server.warmup()
        futs = [server.submit(s) for s in sents]
        got = [f.result(timeout=120) for f in futs]
    assert got == want
    seen = set()
    for p in server._predictors:
        leaf_devs = {d for leaf in jax.tree_util.tree_leaves(p.params)
                     for d in leaf.devices()}
        assert len(leaf_devs) == 1
        seen |= leaf_devs
    assert len(seen) == len(devices)
    stats = server.stats()
    assert stats["served"] == 32          # warmup bypasses the queue
    assert sum(stats["replica_batches"]) == stats["batches"]


def test_max_queue_sheds_load_and_counts_rejections():
    """Backpressure: once the queue holds max_queue requests, submit fails
    fast with QueueFull; accepted requests still resolve correctly and the
    rejection count is exposed through stats()."""
    from mtvaf_tpu.serve import QueueFull

    fake = _RecordingPredictor(delay_s=0.1)
    with BatchingServer(fake, max_batch=1, max_wait_ms=1.0,
                        max_queue=2) as server:
        accepted, rejected = [], 0
        for i in range(20):                 # flood far faster than 1/0.1 s
            try:
                accepted.append((f"s{i}", server.submit(f"s{i}")))
            except QueueFull:
                rejected += 1
        assert rejected > 0
        for sent, fut in accepted:
            assert fut.result(timeout=30) == [(sent, "POS")]
    stats = server.stats()
    assert stats["rejected"] == rejected
    assert stats["served"] == len(accepted)


def test_max_queue_validation():
    with pytest.raises(ValueError):
        BatchingServer(_RecordingPredictor(), max_queue=0)


def test_warmup_compiles_image_programs_for_prefix_predictor():
    """For prefix (multimodal) predictors, warmup must compile the
    image-bearing packed program per rung too — the first image-carrying
    request would otherwise stall the queue for a mid-serving compile."""
    import os
    import tempfile

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.synthetic import make_vocab_file
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.infer import CrfPredictor
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.nn.models import init_crf_model_params
    from mtvaf_tpu.nn.resnet import init_resnet_params

    d = tempfile.mkdtemp()
    make_vocab_file(os.path.join(d, "vocab.txt"))
    tok = FullTokenizer(os.path.join(d, "vocab.txt"))
    cfg = Config(dataset_name="twitter2015", max_seq=24, bf16=False,
                 use_prefix=True, use_18=True, prefix_len=4,
                 num_anp_classes=8)
    bc = BertConfig.tiny(vocab_size=len(tok.vocab))
    pred = CrfPredictor(cfg, bc,
                        init_crf_model_params(jax.random.PRNGKey(0), cfg, bc),
                        tok,
                        resnet_params=init_resnet_params(
                            jax.random.PRNGKey(1), depth=18))
    assert pred.serves_images
    with BatchingServer(pred, max_wait_ms=2.0, batch_shapes=(1, 2)) as server:
        server.warmup()
    extras = {key[2] for key in pred._packed_fns}      # (name, segs, extras)
    assert "__fused_guides__" in extras    # fused image+guides program warm
    assert () in extras                                # text program warm


def test_bundle_ladder_defaults_and_validation():
    """mtvaf-serve --bundle derives its ladder from the bundle's exported
    rungs and rejects a ladder the bundle cannot serve."""
    from mtvaf_tpu.cli.serve_main import bundle_ladder

    class _Bundle:
        export_rungs = (1, 16)

    assert bundle_ladder(_Bundle(), None) == [1, 16]
    assert bundle_ladder(_Bundle(), [1, 8]) == [1, 8]   # pads up, warned
    with pytest.raises(SystemExit, match="largest exported rung"):
        bundle_ladder(_Bundle(), [1, 64])
