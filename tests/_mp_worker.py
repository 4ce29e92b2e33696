"""Worker for the real multi-process SPMD test (tests/test_multiprocess.py).

Run as: python _mp_worker.py <coordinator> <num_processes> <process_id>
<data_dir> [pipeline] — forces the CPU platform with 4/num_processes
virtual devices, joins the jax.distributed cluster, trains one trainer
epoch (crf or span pipeline) on a shared 4-device mesh, and prints one
JSON line with the resulting losses/params digest.

With num_processes=1 (and 4 virtual devices) it doubles as the
single-process baseline producing the same global mesh.
"""

import json
import os
import sys


def main(coordinator: str, num_processes: int, process_id: int,
         data_dir: str, pipeline: str = "crf") -> None:
    total = int(os.environ.get("MTVAF_MP_DEVICES", "4"))
    n_local = total // num_processes
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == total

    import numpy as np

    from mtvaf_tpu.core.config import Config
    from mtvaf_tpu.data.datasets import CrfDataset, SpanDataset
    from mtvaf_tpu.data.tokenization import FullTokenizer
    from mtvaf_tpu.nn.bert import BertConfig
    from mtvaf_tpu.nn.models import (init_crf_model_params,
                                     init_span_model_params)
    from mtvaf_tpu.train.trainer_crf import CrfTrainer
    from mtvaf_tpu.train.trainer_span import SpanTrainer

    if pipeline == "gather_big":
        # cross_host_gather with a >16 MB payload per process: the pickled
        # byte length exceeds float32's exact-integer range (2^24), which
        # the original single-float length transport silently rounded —
        # regression for the exact (hi, lo) length pair (core/mesh.py).
        import hashlib

        from jax.sharding import Mesh

        from mtvaf_tpu.core.mesh import cross_host_gather

        mesh = Mesh(np.array(jax.devices()), ("data",))
        payload = np.random.RandomState(process_id).randint(
            0, 256, (1 << 24) + 3 + 7 * process_id).astype(np.uint8).tobytes()
        got = cross_host_gather(payload, mesh)
        assert got[process_id] == payload
        print("MPRESULT " + json.dumps({
            "process_id": process_id,
            "lens": [len(x) for x in got],
            "sha": [hashlib.sha1(x).hexdigest() for x in got],
        }))
        return

    tokenizer = FullTokenizer(os.path.join(data_dir, "vocab.txt"))
    fallback_warned = None
    if pipeline.startswith("crf_guides"):
        # bf16 + visual prefix + device-resident guide table: multi-host
        # table path (per-host submesh storage, global-array assembly via
        # make_array_from_single_device_arrays — train/ingest.GuideCache)
        from mtvaf_tpu.nn.resnet import init_resnet_params
        cfg = Config(dataset_name="twitter2015", use_prefix=True,
                     use_18=True, vao=True, prefix_len=4, max_seq=24,
                     train_batch_size=8, eval_batch_size=8, num_epochs=2,
                     eval_begin_epoch=99, bf16=True, num_anp_classes=8,
                     lr=1e-3, mesh_data=4, seed=13,
                     guide_cache_device_items=64)
        bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
        ds = CrfDataset.load(cfg, tokenizer,
                             os.path.join(data_dir, "train_g.txt"),
                             os.path.join(data_dir, "anp_g.json"),
                             img_dir=os.path.join(data_dir, "imgs"))
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        resnet_params = init_resnet_params(jax.random.PRNGKey(1), depth=18)
        trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=ds,
                             dev_dataset=ds, test_dataset=ds,
                             resnet_params=resnet_params)
        assert trainer.guide_cache is not None
        assert trainer.guide_cache.device_items > 0
        if pipeline == "crf_guides_fallback" and num_processes > 1:
            # Rebuild the cache on a mesh whose MODEL axis spans processes:
            # host_local_submesh has no contiguous whole data rows per
            # process, so the device table must disable itself (with the
            # warning) and every batch must fall back to host-uploaded
            # guides — training still matches the table-path baseline.
            import logging

            from jax.sharding import Mesh
            from mtvaf_tpu.core.mesh import host_local_submesh
            msgs = []

            class _Cap(logging.Handler):
                def emit(self, record):
                    msgs.append(record.getMessage())

            logging.getLogger("mtvaf_tpu.train.ingest").addHandler(_Cap())
            by_proc = {}
            for d in jax.devices():
                by_proc.setdefault(d.process_index, []).append(d)
            procs = sorted(by_proc)
            span = np.array([[by_proc[p][r] for p in procs]
                             for r in range(len(by_proc[procs[0]]))])
            span_mesh = Mesh(span, ("data", "model"))
            assert host_local_submesh(span_mesh) is None
            trainer.guide_cache = type(trainer.guide_cache)(
                resnet_params, 18, max_items=cfg.guide_cache_size,
                device_items=64, mesh=span_mesh)
            assert trainer.guide_cache.device_items == 0
            fallback_warned = any("device guide table disabled" in m
                                  for m in msgs)
        elif num_processes > 1:
            # table stored on THIS host's contiguous data rows
            assert trainer.guide_cache._assemble_global
            sub = trainer.guide_cache._store_mesh
            assert all(d.process_index == jax.process_index()
                       for d in sub.devices.flat)
    elif pipeline.startswith("crf"):
        preempt = pipeline == "crf_preempt"
        cfg = Config(dataset_name="twitter2015", max_seq=24,
                     train_batch_size=8, eval_batch_size=8,
                     num_epochs=3 if preempt else 1,
                     eval_begin_epoch=99, bf16=False, num_anp_classes=8,
                     lr=1e-3,
                     mesh_data=4 if pipeline == "crf_accum" else total,
                     seed=13,
                     save_checkpoints=preempt,
                     # one SHARED dir: orbax coordinates the multi-process
                     # write to a single path (meta sidecars are identical)
                     save_path=os.path.join(data_dir, "preempt_out")
                     if preempt else None,
                     gradient_accumulation_steps=2
                     if pipeline == "crf_accum" else 1)
        bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
        ds = CrfDataset.load(cfg, tokenizer,
                             os.path.join(data_dir, "train.txt"),
                             os.path.join(data_dir, "anp.json"))
        params = init_crf_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        trainer = CrfTrainer(cfg, bert_cfg, params, train_dataset=ds,
                             dev_dataset=ds, test_dataset=ds)
    else:
        # permissive logit_threshold: eval-branch candidates survive the
        # filters, so the cross-process dev_loss comparison binds real
        # values (at the default 8.0 a near-init model's batches have zero
        # candidates and the reference-exact ac-loss is NaN on both sides)
        cfg = Config(dataset_name="twitter15", max_seq=32,
                     train_batch_size=8, eval_batch_size=8, num_epochs=1,
                     eval_begin_epoch=99, n_best_size=8, max_answer_length=4,
                     bf16=False, lr=1e-3, mesh_data=4, seed=13,
                     logit_threshold=-50.0)
        bert_cfg = BertConfig.tiny(vocab_size=len(tokenizer.vocab))
        ds = SpanDataset.load(cfg, tokenizer,
                              os.path.join(data_dir, "train_span.txt"))
        params = init_span_model_params(jax.random.PRNGKey(0), cfg, bert_cfg)
        trainer = SpanTrainer(cfg, bert_cfg, params, train_dataset=ds,
                              dev_dataset=ds, test_dataset=ds)

    assert trainer.mesh is not None and trainer.mesh.devices.size in (4, total)
    if num_processes > 1:
        # the global train mesh spans processes; eval gets a host-local mesh
        assert any(d.process_index != jax.process_index()
                   for d in trainer.mesh.devices.flat)
        assert all(d.process_index == jax.process_index()
                   for d in trainer.eval_mesh.devices.flat)

    if pipeline == "crf_preempt":
        # SIGTERM ONLY process 0 at the end of epoch 1: the cross-host
        # agreed stop (trainer._should_stop) must make BOTH processes
        # checkpoint and stop after the same epoch — divergent stop
        # decisions would deadlock the coordinated save/collectives
        # (caught by the test's subprocess timeout).
        import logging
        import signal

        class _Sig(logging.Handler):
            def emit(self, record):
                if ("epoch 1 train loss" in record.getMessage()
                        and process_id == 0):
                    os.kill(os.getpid(), signal.SIGTERM)

        tlog = logging.getLogger("mtvaf_tpu.train.trainer_crf")
        tlog.setLevel(logging.INFO)
        tlog.addHandler(_Sig())

    trainer.train()

    ckpt_ok = None
    if pipeline.startswith("crf"):
        # multi-process checkpoint roundtrip: every process participates in
        # the process-coordinated orbax write to a SHARED directory, then
        # restores and compares (num_processes=1 covers the plain path)
        from mtvaf_tpu.core.checkpoint import wait_for_checkpoints
        from mtvaf_tpu.train.resume import (load_latest_checkpoint,
                                            save_epoch_checkpoint)
        ck = os.path.join(data_dir, f"ckpt_{pipeline}_np{num_processes}")
        save_epoch_checkpoint(ck, trainer.state, 1, {"rng": [0, 1]})
        wait_for_checkpoints()
        state2, start_epoch, meta = load_latest_checkpoint(ck, trainer.state)
        ckpt_ok = bool(state2 is not None and start_epoch == 2 and all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(trainer.state.params),
                            jax.tree.leaves(state2.params))))

    # dev prediction through the (host-local on multi-process) eval mesh
    if pipeline.startswith("crf"):
        y_true, y_pred, dev_loss = trainer._predict(trainer.dev_dataset)
    else:
        results, dev_loss = trainer._predict(trainer.dev_dataset,
                                             compute_loss=True)
        y_pred = [list(map(int, r.cls_pred)) for r in results]
    digest = float(sum(np.abs(np.asarray(x, np.float64)).sum()
                       for x in jax.tree.leaves(trainer.state.params)))
    first_leaf = np.asarray(jax.tree.leaves(trainer.state.params)[0])
    print("MPRESULT " + json.dumps({
        "process_id": process_id,
        "step": int(trainer.state.step),
        "dev_loss": float(dev_loss),
        "params_digest": digest,
        "first_leaf_sum": float(first_leaf.astype(np.float64).sum()),
        "train_f1": trainer.last_train_f1,   # cross-host-summed counts
        "ckpt_ok": ckpt_ok,
        "table_rows": len(trainer.guide_cache._dev_rows)
        if getattr(trainer, "guide_cache", None) is not None else None,
        "fallback_warned": fallback_warned,
        "y_pred": y_pred,
    }))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
         sys.argv[5] if len(sys.argv) > 5 else "crf")
