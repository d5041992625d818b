"""Profiling, analytic FLOPs, and numeric-debug hooks.

Reference equivalents (SURVEY.md §5): the per-iter Timer is in
mage_tpu.utils.timer; the FLOPs estimators mirror the reference's manual
calculators (modules/mage_model.py:55-70,97-102,119-123); numeric debug
mode replaces ``torch.autograd.set_detect_anomaly(True)``
(main_mage.py:136) with JAX's debug_nans — off by default because, like
detect_anomaly, it costs real throughput.
"""

from __future__ import annotations

import contextlib
from typing import Iterator


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks(enable: bool = True) -> None:
    """NaN/Inf detection in every jitted computation (the reference keeps
    anomaly detection always-on during training, main_mage.py:136; here it
    is opt-in)."""
    import jax

    jax.config.update("jax_debug_nans", enable)


def axial_block_flops(d_model: int, token_num: int, axis_len: int) -> int:
    """Reference AxialAttentionBlock.flops (mage_model.py:55-70)."""
    return (
        3 * token_num * d_model * d_model
        + token_num * axis_len * d_model * 2
        + 2 * token_num * d_model * d_model * 4
        + token_num * d_model * 2
    )


def cross_attn_flops(d_model: int, q_num: int = 16 * 16, k_num: int = 20) -> int:
    """Reference TransformerBlock.flops (mage_model.py:97-102)."""
    return (
        k_num * d_model * d_model * 2
        + q_num * d_model * d_model
        + q_num * k_num * d_model * 2
        + 2 * q_num * d_model * d_model * 4
        + q_num * d_model
    )


def mage_decoder_flops(
    d_model: int = 512,
    layers: int = 6,
    frames_length: int = 10,
    resolution: int = 16,
) -> int:
    """Full FlatAxialDecoder forward FLOPs (axial layers cycling T/H/W)."""
    token_num = resolution * resolution * frames_length
    total = 0
    for i in range(layers):
        axis_len = frames_length if i % 3 == 0 else resolution
        total += axial_block_flops(d_model, token_num, axis_len)
    return total


def jit_cost_analysis(fn, *args) -> dict:
    """XLA's own cost model for a jitted callable — flops / bytes accessed.

    The compiler-measured counterpart to the analytic estimators above."""
    import jax

    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # one entry per device program
        analysis = analysis[0]
    return dict(analysis) if analysis else {}
