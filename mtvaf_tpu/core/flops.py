"""Static FLOP accounting for bench MFU reporting.

Model FLOPs are a pure function of the config (static shapes), so achieved
TFLOP/s and %-of-peak can be derived from measured examples/s — making
utilization regressions visible independently of batch/seq choices
(round-2 verdict next-step #9).  Counts follow the standard 6·N·s
convention (2·N·s forward matmul FLOPs, 4·N·s backward) plus the explicit
attention-score/value matmuls, which the parameter count misses.
"""

from __future__ import annotations


def encoder_matmul_params(bert_cfg) -> int:
    """Weight elements participating in encoder matmuls (per layer: fused
    QKV h→3h, attention out h→h, MLP h→i→h), excluding embeddings (gathers)
    and biases/LN (bandwidth-bound, negligible FLOPs)."""
    h = bert_cfg.hidden_size
    i = bert_cfg.intermediate_size
    per_layer = h * 3 * h + h * h + 2 * h * i
    return bert_cfg.num_hidden_layers * per_layer


def train_flops_per_example(bert_cfg, seq_len: int,
                            prefix_len: int = 0) -> float:
    """fwd+bwd FLOPs per example for one train step.

    6·N_matmul·s for the parameterized matmuls + 12·s·T·h per layer for the
    QK^T / probs·V attention pairs (T = s + prefix KV slots).  Heads, CRF
    recursions, LN and softmax are bandwidth-bound and excluded; this makes
    the reported MFU slightly conservative.
    """
    n = encoder_matmul_params(bert_cfg)
    t = seq_len + prefix_len
    attn = 12 * seq_len * t * bert_cfg.hidden_size \
        * bert_cfg.num_hidden_layers
    return 6.0 * n * seq_len + attn


# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets).
_CHIP_PEAK_BF16 = (
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v5", 459e12),
    ("v6e", 918e12), ("v6 lite", 918e12), ("trillium", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def chip_peak_flops(device=None) -> float:
    """bf16 peak FLOP/s of the attached chip (197 TF v5e default)."""
    if device is None:
        import jax
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _CHIP_PEAK_BF16:
        if key in kind:
            return peak
    return 197e12


def mfu_fields(bert_cfg, seq_len: int, ex_per_sec: float, *,
               prefix_len: int = 0, device=None) -> dict:
    """{'tflops': achieved TFLOP/s, 'mfu_pct': % of chip bf16 peak}."""
    flops = train_flops_per_example(bert_cfg, seq_len, prefix_len)
    achieved = flops * ex_per_sec
    peak = chip_peak_flops(device)
    return {"tflops": round(achieved / 1e12, 1),
            "mfu_pct": round(100.0 * achieved / peak, 1)}
