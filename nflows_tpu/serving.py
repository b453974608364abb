"""Serving: ahead-of-time compiled, fixed-shape flow endpoints.

For deployment, compile the inference entry points (AOT via
``jit(...).lower().compile()``) for fixed batch shapes, so serving never
pays tracing/compilation at request time and rejects shape drift loudly.
Each endpoint compiles lazily on first use (a process that only serves
``log_prob`` pays one compile, not three).

    served = CompiledFlow(flow, batch_size=1024, features=6)
    lp = served.log_prob(x)                 # x: [1024, 6]
    s  = served.sample(key)                 # [num_samples, 6]
    s, lp = served.sample_and_log_prob(key)
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["CompiledFlow"]

logger = logging.getLogger(__name__)


class CompiledFlow:
    """Fixed-shape AOT-compiled wrapper around a Flow — or any
    Distribution with the same endpoint surface (e.g. a MADEMoG /
    MixtureOfGaussiansMADE mixture density, whose log_prob auto-selects
    its megakernel)."""

    def __init__(self, flow, batch_size: int, features: int,
                 num_samples: Optional[int] = None,
                 context_features: Optional[int] = None,
                 dtype=jnp.float32, use_fused: Optional[bool] = None):
        self._flow = flow
        self.batch_size = batch_size
        self.features = features
        self.num_samples = num_samples or batch_size
        self.context_features = context_features
        self._dtype = dtype
        self._compiled = {}

        # Serving is the amortized-inference context, so the whole-flow
        # Pallas megakernels (NSF 1.5x / MAF-sampling 1.94x the XLA chain
        # on TPU — BASELINE.md round 2) are the DEFAULT here whenever the
        # flow qualifies and a TPU is present; the one-time extraction cost
        # is paid at CompiledFlow construction, exactly where AOT compiles
        # already live. ``dtype`` governs the fused GEMM precision too
        # (fp32 default; pass jnp.bfloat16 for the fastest path).
        # use_fused=False opts out; use_fused=True raises if the flow does
        # not qualify; auto mode (None) also skips flows whose resident
        # weights would not comfortably fit the kernel's VMEM budget, and
        # falls back to the XLA endpoints rather than failing.
        # Numerics: the kernel and the XLA chain are two independent fp32
        # programs on hardware whose exp is ~39 ulp, so trained (peaked)
        # splines can disagree by up to a few 1e-2 nats in log_prob on
        # tail samples near bin edges (measured 0.03 worst-case at 4k
        # samples; typical agreement 1e-4). Pass use_fused=False where
        # exact agreement with the XLA chain is required.
        self._fused = None          # lane tile sized for log_prob requests
        self._fused_sampling = None  # lane tile sized for sampling requests
        if use_fused is None or use_fused:
            self._fused = self._try_build_fused(flow, required=bool(use_fused))
            if self._fused is not None:
                if use_fused is None and not CompiledFlow._warned_auto_fused:
                    # auto-selection changes serving numerics vs the XLA
                    # chain by up to ~0.03 nats on trained peaked splines
                    # (see the numerics note above) — say so ONCE per
                    # process (a deployment constructing one CompiledFlow
                    # per shape variant should not drown its logs), and
                    # expose `is_fused` so deployments can assert the path
                    CompiledFlow._warned_auto_fused = True
                    logger.info(
                        "CompiledFlow auto-selected the fused %s megakernel "
                        "path (numerics may differ from the XLA chain by up "
                        "to ~1e-2 nats on tail samples; pass use_fused=False "
                        "for exact XLA-chain agreement; check .is_fused)",
                        type(self._fused).__name__,
                    )
                # conditional sampling draws num_samples rows PER context;
                # reuse the log_prob view whenever its LANE TILE already
                # covers the sampling rows (row counts may differ while the
                # padded tile is identical — a second view would recompile
                # the same megakernel for nothing). Views without fused
                # sampling (FusedMADEMoG — sequential per-feature draws
                # stay on XLA) leave sampling to the AOT endpoints.
                if hasattr(self._fused, "with_lanes"):
                    sample_rows = self.num_samples * (
                        1 if self.context_features is None
                        else self.batch_size)
                    sample_lanes = self._lane_tile(sample_rows)
                    self._fused_sampling = (
                        self._fused if sample_lanes == self._fused._lanes
                        else self._fused.with_lanes(sample_lanes)
                    )

    _FUSED_VMEM_BUDGET = 48 * 1024 * 1024  # conservative half of the 100MB cap
    _warned_auto_fused = False  # process-wide once-guard for the info log

    @property
    def is_fused(self) -> bool:
        """True when requests run the whole-flow Pallas megakernel rather
        than the AOT-compiled XLA chain."""
        return self._fused is not None

    @staticmethod
    def _lane_tile(target: int) -> int:
        return min(2048, max(128, -(-target // 128) * 128))

    def _try_build_fused(self, flow, required: bool):
        from nflows_tpu.ops.pallas.mademog_fused import fuse_mademog
        from nflows_tpu.ops.pallas.maf_fused import fuse_maf
        from nflows_tpu.ops.pallas.nsf_fused import fuse_nsf
        from nflows_tpu.ops.pallas.rq_spline import pallas_available

        if not required and not pallas_available():
            return None

        # size the lane tile to the actual request shapes (the kernels pad
        # ragged batches up to one lane tile — a 2048 default would make
        # every batch-32 request compute 64x the needed work); log_prob
        # views use batch_size, sampling views get their own num_samples
        # tile via with_lanes in __init__
        lanes = self._lane_tile(self.batch_size)

        # all megakernels support per-sample context (round 3); the
        # MADEMoG candidate fuses log_prob only (its sampling is the
        # sequential XLA path, served via the AOT endpoints)
        errors = []
        for fuse in (fuse_nsf, fuse_maf, fuse_mademog):
            try:
                fused = fuse(flow, dtype=self._dtype, lanes=lanes)
            except (ValueError, AttributeError) as e:
                errors.append(str(e))
                continue
            fused_ctx = getattr(fused, "context_features", None)
            if (fused_ctx is None) != (self.context_features is None):
                msg = ("flow conditionality does not match CompiledFlow's "
                       f"context_features={self.context_features}")
                if required:
                    raise ValueError(msg)
                errors.append(msg)
                continue
            weight_bytes = sum(
                w.nbytes for w in fused._weights.values())
            if weight_bytes > self._FUSED_VMEM_BUDGET:
                if required:
                    raise ValueError(
                        f"flow's stacked weights ({weight_bytes/2**20:.0f} "
                        "MB) exceed the fused kernel's VMEM budget; use "
                        "use_fused=False or a bf16 dtype")
                errors.append("weights exceed fused VMEM budget")
                continue
            return fused
        if required:
            raise ValueError(
                "use_fused=True but this flow matches neither the NSF nor "
                f"the MAF megakernel structure: {errors}")
        return None

    # -- lazy AOT compilation ------------------------------------------------

    def _specs(self):
        x_spec = jax.ShapeDtypeStruct((self.batch_size, self.features),
                                      self._dtype)
        key_spec = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
        c_spec = None
        if self.context_features is not None:
            c_spec = jax.ShapeDtypeStruct(
                (self.batch_size, self.context_features), self._dtype)
        return x_spec, key_spec, c_spec

    def _get(self, name):
        if name in self._compiled:
            return self._compiled[name]
        x_spec, key_spec, c_spec = self._specs()
        n = self.num_samples
        if c_spec is None:
            builders = {
                "log_prob": lambda: jax.jit(
                    lambda f, x: f.log_prob(x)).lower(self._flow, x_spec),
                "sample": lambda: jax.jit(
                    lambda f, k: f.sample(k, n)).lower(self._flow, key_spec),
                "sample_and_log_prob": lambda: jax.jit(
                    lambda f, k: f.sample_and_log_prob(k, n)
                ).lower(self._flow, key_spec),
            }
        else:
            builders = {
                "log_prob": lambda: jax.jit(
                    lambda f, x, c: f.log_prob(x, c)
                ).lower(self._flow, x_spec, c_spec),
                "sample": lambda: jax.jit(
                    lambda f, k, c: f.sample(k, n, context=c)
                ).lower(self._flow, key_spec, c_spec),
                "sample_and_log_prob": lambda: jax.jit(
                    lambda f, k, c: f.sample_and_log_prob(k, n, context=c)
                ).lower(self._flow, key_spec, c_spec),
            }
        compiled = builders[name]().compile()
        self._compiled[name] = compiled
        return compiled

    # -- request-time validation ----------------------------------------------

    def _check_inputs(self, x):
        if x.shape != (self.batch_size, self.features):
            raise ValueError(
                f"CompiledFlow expects inputs of shape "
                f"{(self.batch_size, self.features)}, got {tuple(x.shape)}"
            )

    def _check_context(self, context):
        if self.context_features is None:
            if context is not None:
                raise ValueError(
                    "CompiledFlow was built without context_features but a "
                    "context was passed — it would be silently ignored; "
                    "rebuild with context_features=<dim>"
                )
            return
        if context is None:
            raise ValueError(
                "CompiledFlow was built with "
                f"context_features={self.context_features}; a context of "
                f"shape {(self.batch_size, self.context_features)} is required"
            )
        expected = (self.batch_size, self.context_features)
        if context.shape != expected:
            raise ValueError(
                f"CompiledFlow expects context of shape {expected}, got "
                f"{tuple(context.shape)}"
            )

    @staticmethod
    def _check_key(key):
        if not jnp.issubdtype(getattr(key, "dtype", None), jax.dtypes.prng_key):
            # accept legacy uint32[2] keys by converting them
            key = jnp.asarray(key)
            if key.dtype == jnp.uint32 and key.shape == (2,):
                return jax.random.wrap_key_data(key)
            raise TypeError(
                "CompiledFlow endpoints take a jax.random.key()-style typed "
                f"PRNG key (or a legacy PRNGKey uint32[2]); got {key!r}"
            )
        return key

    # -- endpoints -------------------------------------------------------------

    def log_prob(self, inputs, context=None):
        self._check_inputs(inputs)
        self._check_context(context)
        if self._fused is not None:
            return self._fused.log_prob(inputs, context)
        if self.context_features is None:
            return self._get("log_prob")(self._flow, inputs)
        return self._get("log_prob")(self._flow, inputs, context)

    def sample(self, key, context=None):
        key = self._check_key(key)
        self._check_context(context)
        if self._fused_sampling is not None:
            return self._fused_sampling.sample(key, self.num_samples,
                                               context=context)
        if self.context_features is None:
            return self._get("sample")(self._flow, key)
        return self._get("sample")(self._flow, key, context)

    def sample_and_log_prob(self, key, context=None) -> Tuple:
        key = self._check_key(key)
        self._check_context(context)
        if self._fused_sampling is not None:
            return self._fused_sampling.sample_and_log_prob(
                key, self.num_samples, context=context)
        if self.context_features is None:
            return self._get("sample_and_log_prob")(self._flow, key)
        return self._get("sample_and_log_prob")(self._flow, key, context)
