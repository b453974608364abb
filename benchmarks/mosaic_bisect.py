"""Bisect which packed-spline construct hangs Mosaic. One stage per
process: `python mosaic_bisect.py <stage>`. Minimal [24, 256] kernels.
Stages ordered by increasing suspicion.

RESULTS on this toolchain (2026-08-17, one real TPU chip; see DESIGN.md
"Round-3 sublane attack"):
  prefix            2.4 s   OK (fast)
  slice             126 s   OK (relayout search, slow)
  bcast             121 s   OK (slow)
  fold              196 s   OK (slow)
  select            HANG    >10 min, wedges the tunnel — the concat-shift
                            one-hot select is the Mosaic no-go
Consequence: the shipped packed spline stage
(nflows_tpu/ops/pallas/nsf_flow_kernel._rq_spline_TR_packed) expresses
all structural moves as kron(S, I_T) matmuls built in-trace from
broadcasted_iota. NOTE: the sel_matmul/packed_rq stages below predate the
in-trace builders and construct the kron matrices as captured numpy
constants, which current pallas rejects with "captures constants" — kept
verbatim as the historical bisect record; run the shipped kernel (or
tests/ops/test_packed_spline.py) for the working matmul form.

CAUTION: run each stage under `timeout` in its own process; a hung stage
wedges the TPU tunnel for 10-20 min.
"""
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

stage = sys.argv[1]
t0 = time.time()
T, K, R = 3, 8, 256
KT = K * T


def log(m):
    print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)


def fold(t, n, op):
    while n > 1:
        m = n // 2
        lo = t[: m * T]
        hi = t[m * T: 2 * m * T]
        folded = op(lo, hi)
        if n % 2:
            folded = jnp.concatenate([folded, t[2 * m * T:]], axis=0)
            n = m + 1
        else:
            n = m
        t = folded
    return t


def prefix(t, n):
    s = 1
    while s < n:
        sh = jnp.concatenate([jnp.zeros_like(t[: s * T]), t[: -s * T]], axis=0)
        t = t + sh
        s *= 2
    return t


def bcast(v, n):
    return jnp.concatenate([v] * n, axis=0)


def body(x):
    if stage == "slice":           # unaligned multi-row slice + concat
        return jnp.concatenate([x[3:12], x[:3], x[12:]], axis=0)
    if stage == "fold":            # tree fold to [T, R], bcast back
        return bcast(fold(x, K, jnp.maximum), K)
    if stage == "prefix":          # shifted adds
        return prefix(x, K)
    if stage == "bcast":           # [T,R] -> [KT,R]
        return bcast(x[:T], K)
    if stage == "normalize":       # the packed softmax
        vmax = fold(x, K, jnp.maximum)
        e = jnp.exp(x - bcast(vmax, K))
        tot = fold(e, K, jnp.add)
        return 0.01 + 0.92 * e * bcast(1.0 / tot, K)
    if stage == "select":          # onehot via ge + fold-select
        up = prefix(jnp.abs(x) + 0.1, K)
        xb = bcast(x[:T], K - 1)
        ge = (xb >= up[: (K - 1) * T]).astype(x.dtype)
        one = jnp.ones_like(x[:T])
        zero = jnp.zeros_like(x[:T])
        onehot = (jnp.concatenate([one, ge], axis=0)
                  - jnp.concatenate([ge, zero], axis=0))
        return bcast(fold(onehot * x, K, jnp.add), K)
    if stage == "sel_ge":          # just the groupwise compare + astype
        up = prefix(jnp.abs(x) + 0.1, K)
        xb = bcast(x[:T], K - 1)
        ge = (xb >= up[: (K - 1) * T]).astype(x.dtype)
        return jnp.concatenate([ge, x[: 3 * T]], axis=0)
    if stage == "sel_ge_where":    # compare via where, no bool astype
        up = prefix(jnp.abs(x) + 0.1, K)
        xb = bcast(x[:T], K - 1)
        ge = jnp.where(xb >= up[: (K - 1) * T],
                       jnp.ones_like(xb), jnp.zeros_like(xb))
        return jnp.concatenate([ge, x[: 3 * T]], axis=0)
    if stage == "sel_onehot":      # concat-shift subtract of a float field
        g = jnp.tanh(x[: (K - 1) * T])
        one = jnp.ones_like(x[:T])
        zero = jnp.zeros_like(x[:T])
        onehot = (jnp.concatenate([one, g], axis=0)
                  - jnp.concatenate([g, zero], axis=0))
        return onehot
    if stage == "sel_mulfold":     # multiply + fold on precomputed floats
        g = jnp.tanh(x)
        return bcast(fold(g * x, K, jnp.add), K)
    if stage == "sel_matmul":      # onehot via matmul shift (no concat)
        import numpy as _np
        Sshift = jnp.asarray(_np.kron(_np.eye(K, k=1), _np.eye(T)),
                             jnp.float32)          # out grp k = in grp k+1
        Mb = jnp.asarray(_np.kron(_np.ones((K, 1)), _np.eye(T)), jnp.float32)
        Ms = jnp.asarray(_np.kron(_np.ones((1, K)), _np.eye(T)), jnp.float32)
        up = prefix(jnp.abs(x) + 0.1, K)
        xb = jax.lax.dot_general(Mb, x[:T], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ge = (xb >= up).astype(x.dtype)            # [KT, R]
        ge_next = jax.lax.dot_general(Sshift, ge, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        onehot = ge - ge_next
        sel = jax.lax.dot_general(Ms, onehot * x, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return jax.lax.dot_general(Mb, sel, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    if stage == "packed_rq":       # full packed spline select pipeline
        import numpy as _np
        Sshift = jnp.asarray(_np.kron(_np.eye(K, k=1), _np.eye(T)),
                             jnp.float32)
        Mb = jnp.asarray(_np.kron(_np.ones((K, 1)), _np.eye(T)), jnp.float32)
        Ms = jnp.asarray(_np.kron(_np.ones((1, K)), _np.eye(T)), jnp.float32)
        Lp = jnp.asarray(_np.kron(_np.tril(_np.ones((K, K))), _np.eye(T)),
                         jnp.float32)

        def mm(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        # packed softmax (fold-max for stability, matmul bcast/sum)
        vmax = fold(x, K, jnp.maximum)
        e = jnp.exp(x - mm(Mb, vmax))
        tot = mm(Ms, e)
        w = 0.01 + 0.92 * e * mm(Mb, 1.0 / tot)
        # edges via group prefix matmul; right/left bit-consistent
        up = 2.0 * mm(Lp, w) - 1.0
        xv = x[:T]
        xb = mm(Mb, xv)
        ge = (xb >= up).astype(x.dtype)
        onehot = ge - mm(Sshift, ge)
        sel_w = mm(Ms, onehot * w)
        sel_up = mm(Ms, onehot * up)
        return mm(Mb, sel_w + sel_up)
    if stage == "all":             # everything chained
        vmax = fold(x, K, jnp.maximum)
        e = jnp.exp(x - bcast(vmax, K))
        tot = fold(e, K, jnp.add)
        w = 0.01 + 0.92 * e * bcast(1.0 / tot, K)
        up = prefix(w, K)
        xb = bcast(x[:T], K - 1)
        ge = (xb >= up[: (K - 1) * T]).astype(x.dtype)
        one = jnp.ones_like(x[:T])
        zero = jnp.zeros_like(x[:T])
        onehot = (jnp.concatenate([one, ge], axis=0)
                  - jnp.concatenate([ge, zero], axis=0))
        return bcast(fold(onehot * w, K, jnp.add), K)
    raise SystemExit(f"unknown stage {stage}")


def kernel(x_ref, o_ref):
    o_ref[...] = body(x_ref[...])


x = jnp.arange(KT * R, dtype=jnp.float32).reshape(KT, R) / (KT * R)
log(f"compiling stage={stage}")
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((KT, R), jnp.float32),
)(x)
val = float(out.sum())
log(f"stage={stage} OK sum={val:.4f}")
