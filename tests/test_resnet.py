"""ResNet parity vs a torch oracle with torchvision-compatible layout.

torchvision itself is unavailable in this image; the oracle builds the same
architecture with torch.nn using torchvision's state-dict naming so the
converter (core/convert.resnet_params_from_torch) is exercised end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtvaf_tpu.core.convert import resnet_params_from_torch
from mtvaf_tpu.nn.resnet import (BLOCK_COUNTS, init_resnet_params,
                                 resnet_stage_guides, resnet_stages)

torch = pytest.importorskip("torch")
nn = torch.nn


# torch-side oracle shared with the parity harness (torchvision
# state-dict layout + stages()); one copy only
from mtvaf_tpu.parity.torchstubs import (BasicBlock, Bottleneck,  # noqa: E402,F401
                                         TorchResNet)


def randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)


@pytest.mark.parametrize("depth,block", [(18, BasicBlock), (50, Bottleneck)])
def test_stage_parity(depth, block):
    torch.manual_seed(0)
    model = TorchResNet(block, list(BLOCK_COUNTS[depth]))
    randomize_bn(model)
    model.eval()
    params = resnet_params_from_torch(model.state_dict(), BLOCK_COUNTS[depth])

    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_stages = model.stages(torch.tensor(x))
    with jax.default_matmul_precision("highest"):
        got_stages = resnet_stages(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                   depth=depth)
    for i, (g, r) in enumerate(zip(got_stages, ref_stages)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), r.numpy(), atol=1e-3,
            rtol=1e-3, err_msg=f"stage {i}")


def test_stage_guides_packing():
    """Guides must be (B, 4, C_total) in channel-major order matching
    torch.cat(...).view (reference models/bert_model.py:383)."""
    torch.manual_seed(1)
    model = TorchResNet(BasicBlock, list(BLOCK_COUNTS[18]))
    randomize_bn(model, 1)
    model.eval()
    params = resnet_params_from_torch(model.state_dict(), BLOCK_COUNTS[18])

    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        stages = model.stages(torch.tensor(x))
        pooled = []
        for s in stages:
            ft = s.shape[2]
            k = ft // 2
            pooled.append(torch.nn.functional.avg_pool2d(s, k, k))
        ref = torch.cat(pooled, dim=1).reshape(2, 4, -1)
    with jax.default_matmul_precision("highest"):
        got = resnet_stage_guides(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                  depth=18)
    assert got.shape == (2, 4, 960)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-3, rtol=1e-3)


def test_init_shapes():
    params = init_resnet_params(jax.random.PRNGKey(0), depth=18)
    x = jnp.zeros((1, 64, 64, 3))
    guides = resnet_stage_guides(params, x, depth=18)
    assert guides.shape == (1, 4, 960)
