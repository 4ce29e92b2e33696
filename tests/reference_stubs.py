"""Shared machinery for importing the reference's own code as an oracle.

The reference tree (/root/reference) is PUBLIC UNTRUSTED CONTENT: it is
imported for behavior comparison only.  Its import-time dependencies that
are not installed here (apex, torchcrf, torchvision, seqeval) are replaced
with minimal stand-ins whose semantics are pinned by our own unit tests:

* ``_StubCRF`` agrees with ``mtvaf_tpu.nn.crf`` (itself brute-force tested
  against exact enumeration, tests/test_crf.py);
* the seqeval ``classification_report`` stub is our
  ``mtvaf_tpu.eval.tagging.classification_report``, whose scores match real
  seqeval where installed (tests/test_metrics.py) and whose byte layout
  survives the reference's string-slicing F1 parse (modules/train.py:669).

Used by tests/test_reference_oracle.py (forward/trajectory/span-decode
oracles) and tests/test_reference_trainer_e2e.py (full-trainer runs).
"""

import importlib.machinery
import os
import sys
import types

import torch
from torch import nn

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "models"))


# ---------------------------------------------------------------------------
# Minimal correct torchcrf.CRF stand-in (the real package is not installed).
# Semantics match torchcrf: forward returns the log-likelihood with the given
# reduction; decode is Viterbi over masked steps.  Correctness of the CRF
# math itself is covered by brute-force tests on our side (tests/test_crf.py);
# this stub only needs to agree with our crf_loss, which those tests pin.


# (implementation shared with the parity harness; one copy only)
from mtvaf_tpu.parity.torchstubs import StubCRF as _StubCRF  # noqa: E402


def _stub_module(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


def import_reference_models():
    """Import the reference models package with import-blockers stubbed."""
    if "models.bert_model" in sys.modules:
        return sys.modules["models.bert_model"]
    apex = _stub_module("apex")
    apex.amp = types.SimpleNamespace(scale_loss=None)
    torchcrf = _stub_module("torchcrf")
    torchcrf.CRF = _StubCRF
    tv = _stub_module("torchvision")
    tvm = _stub_module("torchvision.models")
    for name in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152"):
        setattr(tvm, name, lambda *a, **k: nn.Identity())
    tv.models = tvm
    # transformers ≥4.41 moved these to pytorch_utils; the fork imports them
    # from modeling_utils.
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu
    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    # doc decorators changed signature across transformers versions; the fork
    # only uses them for docstrings → replace with permissive no-ops.
    import transformers.file_utils as fu

    def _noop_decorator(*a, **k):
        def wrap(fn):
            return fn
        return wrap

    for name in ("add_code_sample_docstrings", "add_start_docstrings",
                 "add_start_docstrings_to_model_forward",
                 "replace_return_docstrings"):
        setattr(fu, name, _noop_decorator)
    sys.path.insert(0, REFERENCE)
    import models.bert_model as rbm
    return rbm


def import_reference_utils():
    """Import the reference models.utils (needs a torchvision.transforms
    attribute at import time; its image code is never called here)."""
    import_reference_models()
    if "models.utils" in sys.modules:
        return sys.modules["models.utils"]
    sys.modules["torchvision"].transforms = types.SimpleNamespace()
    import models.utils as ru
    return ru


def import_reference_trainer():
    """Import the reference ``modules.train`` (SATrainer/SATrainer2) with
    seqeval stubbed by our format-identical classification_report.

    The stub is load-bearing the same way real seqeval is: the reference
    extracts its reported F1 by string-slicing the printed report
    (modules/train.py:667-669), so the stub must render the exact seqeval
    byte layout — pinned by tests/test_metrics.py.
    """
    import_reference_utils()
    from mtvaf_tpu.eval.tagging import classification_report
    if "modules.train" not in sys.modules:
        if "seqeval" not in sys.modules:
            seqeval = _stub_module("seqeval")
            sm = _stub_module("seqeval.metrics")
            sm.classification_report = classification_report
            seqeval.metrics = sm
        import modules.train  # noqa: F401  (registers in sys.modules)
    rt = sys.modules["modules.train"]
    # modules.train binds classification_report at import time; if another
    # test imported it first under a throwaway seqeval stub, rebind ours so
    # the trainer's string-sliced F1 parse (modules/train.py:669) sees the
    # real layout regardless of import order.
    rt.classification_report = classification_report
    return rt
