"""Global runtime configuration for nflows_tpu.

Small, explicit switches — the library has no config-file system, matching
the reference's kwargs-as-config philosophy (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import os
import threading

_tls = threading.local()

_state = {
    # Opt-in: route RQ- and LRS-spline evaluation through the fused
    # Pallas kernels.
    # Default False, from measurement (benchmarks/bench_pallas_rq.py,
    # TPU v5-lite): as a STANDALONE op the fused kernel beats XLA ~3x at
    # every size (3.2-3.7x, 16k-4M elements), but inside a full coupling
    # flow XLA instead fuses the spline into the conditioner's GEMM
    # epilogue, so forcing the Pallas call boundary (materialize [N,K]
    # params + transpose, lose cross-op fusion) is a net loss end-to-end
    # (~0.4x on NSF sampling). Enable for standalone elementwise-spline
    # workloads (learned-CDF stacks with no adjacent GEMM) with
    # set_pallas_splines(True) or NFLOWS_TPU_ENABLE_PALLAS=1.
    "use_pallas_splines": None,
    # Whole-flow megakernel spline-stage layout style. None = per-path
    # measured defaults ('fat' full-sublane relayout for serving,
    # unpacked for training — BASELINE.md round 5); an explicit value
    # (False/'fat'/'roll'/'mm'/True) forces BOTH paths. See
    # packed_spline_select() / _packed_spline_style().
    "packed_spline_select": None,
    # Per-family overrides of the fused-training auto-crossover floors
    # (see fused_train_crossover()).
    "fused_train_crossover": {},
}


@contextlib.contextmanager
def _suspend_pallas_splines():
    """Disable the Pallas-spline dispatch in this thread's dynamic scope.

    Used by the kernels' ``custom_vjp`` backward passes: they differentiate
    the XLA reference implementation, and WITHOUT this the reference's own
    config dispatch would re-enter the Pallas kernel — whose backward calls
    the reference again, recursing without a base case. (Dispatch decisions
    happen at Python trace time, so a thread-local is a sound guard.)"""
    prev = getattr(_tls, "suspend_pallas", False)
    _tls.suspend_pallas = True
    try:
        yield
    finally:
        _tls.suspend_pallas = prev


def use_pallas_splines(enable=None):
    """Get/set whether spline evaluation uses the fused Pallas kernels."""
    if enable is not None:
        _state["use_pallas_splines"] = bool(enable)
        return _state["use_pallas_splines"]
    if getattr(_tls, "suspend_pallas", False):
        return False
    setting = _state["use_pallas_splines"]
    if setting is None:
        setting = bool(os.environ.get("NFLOWS_TPU_ENABLE_PALLAS"))
    if not setting:
        return False
    # even when explicitly enabled, fall back to the XLA path off-TPU
    # rather than crashing in pallas_call lowering
    from nflows_tpu.ops.pallas.rq_spline import pallas_available
    return pallas_available()


def set_pallas_splines(enable: bool) -> None:
    _state["use_pallas_splines"] = bool(enable)


def packed_spline_select(enable=None):
    """Get/set the megakernel's packed-sublane spline stage (see _state).

    Values: ``False`` = unpacked skinny [T, R] chain; ``'roll'`` = packed
    [K*T, R] with roll/repeat structural moves (exact fp32 copies, no
    MXU — round 5); ``'mm'`` or ``True`` = packed with kron(S, I_T)
    HIGHEST-precision structural matmuls (round 3/4 form, measured
    slower than unpacked at the flagship — kept for A/B); ``'auto'`` =
    reset to the per-path defaults.

    Unset (``'auto'``, the default), the per-path defaults follow the
    DEVICE-ONLY chain-slope A/Bs (benchmarks/serve_device_time.py,
    BASELINE.md round 5): SERVING megakernels use ``'fat'`` —
    bit-identical to unpacked and consistently 4-6% faster
    (9.8-10.0 ms vs 10.2-11.3 ms per 262k-sample pass; five
    measurements, no overlap) — while TRAINING kernels stay unpacked
    (fat measured 0.91x at batch 512: the backward relayouts cost more
    than the sublane win). ``'roll'``/``'mm'`` measured slower than
    unpacked device-only and remain A/B levers. Setting any explicit
    value forces BOTH paths.
    """
    if enable is not None:
        if enable == "auto":
            _state["packed_spline_select"] = None
        elif enable in (False, True, "mm", "roll", "fat"):
            _state["packed_spline_select"] = enable
        else:
            raise ValueError(
                "packed_spline_select must be False, True, 'mm', 'roll', "
                f"'fat' or 'auto'; got {enable!r}")
    setting = _state["packed_spline_select"]
    return False if setting is None else setting


def _packed_spline_style(path):
    """Resolve the packed-select style for ``path`` ('serving' or
    'training'): the user's forced setting, else the measured per-path
    default (see :func:`packed_spline_select`)."""
    setting = _state["packed_spline_select"]
    if setting is None:
        return "fat" if path == "serving" else False
    return setting


def fused_train_crossover(overrides: dict = None) -> dict:
    """Get/set overrides for ``training.fused_trainer(auto=True)`` floors.

    ``auto=True`` picks fused vs XLA training per (family, batch) from a
    measured crossover table whose DEFAULTS are TPU v5-lite measurements
    (2026-08-20; BASELINE.md "Round 4/5 measurements"). On a different TPU
    generation — or after a toolchain update — re-measure with::

        python benchmarks/bench_fused_train.py --family nsf --batch 512 ...
        (and --family maf / mademog)

    and install the new floors here. ``overrides`` maps family name
    (``'nsf'``, ``'maf'``, ``'mademog'``, ``'iaf'``) to the minimum batch
    size at which the fused trainer wins (``None`` = the fused path never
    wins, always use the XLA chain; ``0`` = always fused). Families not
    named keep their defaults; repeated calls merge. Pass ``{}``-valued
    sentinel ``clear_fused_train_crossover()`` to reset. Returns the
    current override dict (NOT merged with defaults — the merge happens
    in ``training.fused_trainer``).
    """
    if overrides is not None:
        valid = {"nsf", "maf", "mademog", "iaf"}
        bad = set(overrides) - valid
        if bad:
            raise ValueError(
                f"unknown fused-trainer families {sorted(bad)}; "
                f"valid: {sorted(valid)}")
        _state["fused_train_crossover"].update(overrides)
    return dict(_state["fused_train_crossover"])


def clear_fused_train_crossover() -> None:
    """Reset fused-training crossover floors to the measured defaults."""
    _state["fused_train_crossover"] = {}


def set_matmul_precision(precision: str = "bfloat16") -> None:
    """Set the default MXU matmul precision for fp32 operands.

    'bfloat16' runs conditioner GEMMs as single-pass bf16 MXU ops with fp32
    accumulation (the standard TPU training configuration, ~1.5x faster on
    this workload); 'highest' keeps 6-pass fp32-exact matmuls. Spline
    numerics are elementwise VPU code and unaffected either way.
    """
    import jax
    jax.config.update("jax_default_matmul_precision", precision)


def conv_layout(layout: str = None) -> str:
    """Get/set the internal convolution layout ('nchw' default, 'nhwc').

    Module arrays stay NCHW at every boundary (reference parity); 'nhwc'
    only changes how Conv2d issues the underlying convolution — operands
    transposed to NHWC/HWIO at the call site, result transposed back. On
    TPU, XLA's transpose folding cancels the adjacent transposes between
    consecutive convs/elementwise ops, and NHWC is the layout the conv
    emitter tiles natively (channels on lanes), so conv-heavy image flows
    avoid a per-conv re-layout. Numerics are identical either way
    (tests/nn/test_nets.py); measure with benchmarks/bench_glow_layout.py.

    Precedence note: this global applies to convs built with
    ``layout='auto'``. ``GlowFlow`` pins a measured per-instance layout by
    DEFAULT (NHWC for affine couplings, NCHW for spline couplings), which
    bypasses this setting — pass ``GlowFlow(..., conv_layout='auto')`` to
    make a Glow model follow the global toggle.
    """
    if layout is not None:
        layout = layout.lower()
        if layout not in ("nchw", "nhwc"):
            raise ValueError("conv layout must be 'nchw' or 'nhwc'")
        _state["conv_layout"] = layout
    return _state.get("conv_layout", "nchw")
