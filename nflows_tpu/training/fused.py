"""Auto-selection for the fused (megakernel) trainers.

``fused_trainer(flow, batch_size)`` probes the flow's structure and
returns the matching trainer — :class:`FusedNSFTrainer` for coupling
chains (all seven kinds), :class:`FusedMAFTrainer` for unwrapped
autoregressive chains (MAF / NSF-AR), :class:`FusedIAFTrainer` for
all-wrapped chains (IAF; trains the sampling direction with
``make_vi_train_step``), :class:`FusedMADEMoGTrainer` for bare
mixture-density models (MADEMoG / MixtureOfGaussiansMADE) — mirroring
``serving.CompiledFlow``'s fused auto-select on the training side.
Models that match no kernel raise with each prober's reason (or return
``None`` with ``required=False``), in which case
``training.make_train_step`` (the XLA chain) is the path.
"""

from __future__ import annotations

__all__ = ["fused_trainer"]


# Measured fused-vs-XLA training crossovers: minimum batch at which the
# fused trainer wins (None = the fused path never beat the XLA chain at
# any measured batch; 0 = always fused). HARDWARE-SPECIFIC: measured on
# TPU v5-lite, 2026-08-20/21 (benchmarks/bench_fused_train.py; BASELINE.md
# "Round 4/5 measurements") — on another TPU generation or after a
# toolchain update, re-measure and install new floors with
# ``config.fused_train_crossover({...})``.
_DEFAULT_MIN_AUTO_BATCH = {
    # 1024 measured 0.93-0.95x across two sessions (round 5) — the fused
    # win starts at 2048 (1.30-1.36x), matching README's guidance
    "nsf": 2048,
    "maf": None,
    "mademog": None,
    "iaf": 0,  # VI trainer: no XLA head-to-head exists
}


def fused_trainer(flow, batch_size, interpret=None, required=None,
                  auto=False):
    """Return the fused trainer matching ``flow``'s structure.

    Args:
        flow: a ``Flow`` over a StandardNormal base.
        batch_size: training batch size (multiple of 128 — the kernel
            lane width).
        interpret: force the Pallas interpreter (None = auto: interpret
            off-TPU, compiled on TPU).
        required: when False, return ``None`` instead of raising if no
            kernel matches (the caller falls back to the XLA chain).
            Defaults to ``not auto``; passing ``required=True`` together
            with ``auto=True`` still raises when the flow matches NO
            kernel (a misconfigured flow), while a matching flow that the
            crossover routes to XLA returns ``None`` as usual.
        auto: when True, also return ``None`` when the measured
            fused-vs-XLA training crossover says the XLA chain is faster
            for this (family, batch_size) — the megakernels' training win
            is a large-batch HBM-traffic win (TPU v5-lite, 2026-08-20,
            benchmarks/bench_fused_train.py; BASELINE.md "Round 4
            measurements"): NSF coupling fused = 1.35-1.76x XLA at batch
            >= 2048 but 0.94-1.01x at 512, while the MAF and MADEMoG
            fused paths LOSE at every measured batch (0.82-0.98x — their
            XLA chains are single-MADE-pass programs with little residual
            traffic to save). IAF's variational trainer has no XLA
            equivalent measured against it and is always returned. The
            floors are TPU v5-lite measurements; on other hardware
            override them via ``config.fused_train_crossover``.
    """
    from nflows_tpu import config
    from nflows_tpu.ops.pallas.mademog_train import FusedMADEMoGTrainer
    from nflows_tpu.ops.pallas.maf_train import (
        FusedIAFTrainer,
        FusedMAFTrainer,
    )
    from nflows_tpu.ops.pallas.nsf_train import FusedNSFTrainer

    if required is None:
        required = not auto
    if batch_size % 128:
        raise ValueError(
            f"batch_size={batch_size} must be a multiple of 128 (the "
            "kernel lane width)")
    family = {
        FusedNSFTrainer: "nsf",
        FusedMAFTrainer: "maf",
        FusedMADEMoGTrainer: "mademog",
        FusedIAFTrainer: "iaf",
    }
    min_auto_batch = dict(_DEFAULT_MIN_AUTO_BATCH)
    min_auto_batch.update(config.fused_train_crossover())
    errors = []
    for cls in (FusedNSFTrainer, FusedMAFTrainer, FusedIAFTrainer,
                FusedMADEMoGTrainer):
        try:
            trainer = cls(flow, batch_size=batch_size, interpret=interpret)
        except (ValueError, AttributeError) as e:
            errors.append(f"{cls.__name__}: {e}")
            continue
        if auto:
            floor = min_auto_batch[family[cls]]
            if floor is None or batch_size < floor:
                return None
        return trainer
    if not required:
        return None
    raise ValueError(
        "this flow matches no fused training kernel — train it on the "
        "XLA chain (training.make_train_step). Prober reasons:\n  "
        + "\n  ".join(errors))
