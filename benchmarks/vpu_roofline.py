"""VPU-op roofline for the megakernel's elementwise spline floor.

Round-5 VERDICT item 1's closing evidence: the NSF megakernel is bound
by the skinny [T=3, R] elementwise chain (BASELINE.md "cost anatomy"),
and the open question is whether its ~66 ms / 262k-sample pass is near
the hardware floor or leaves headroom. Two parts:

1. ``--count``: a jaxpr census of the spline stage — trace
   ``_rq_spline_TR`` (and the packed-roll variant) at kernel shapes and
   count VPU element-ops by class (cheap ALU vs transcendental vs
   integer/bool), runs on any backend.

2. (default, needs the TPU) a Mosaic microbench measuring sustained
   VPU throughput for dependent op-chains at the SAME tile shapes the
   kernel uses — [3, R] skinny vs [8, R] / [24, R] full-sublane — for
   mul+add chains and exp chains. Prints ns/element-op per shape.

Floor estimate = census x measured per-class throughput at the relevant
shape; compare against the measured end-to-end pass. If the pass is
within ~20% of the floor, the "skinny-sublane" ceiling is REAL and
closes the item; if not, the gap names the remaining headroom.
"""

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# op classes by jax primitive name
CHEAP = {
    "add", "sub", "mul", "max", "min", "neg", "select_n", "and", "or",
    "xor", "not", "eq", "ne", "ge", "gt", "le", "lt", "abs", "sign",
    "floor", "ceil", "round", "clamp", "convert_element_type", "iota",
    "broadcast_in_dim", "squeeze", "reshape", "concatenate", "slice",
    "pad", "rev", "transpose", "reduce_max", "reduce_sum", "reduce_min",
    "cumsum", "cumlogsumexp", "stop_gradient", "integer_pow",
}
TRANSC = {"exp", "log", "log1p", "logistic", "tanh", "sqrt", "rsqrt",
          "div", "pow", "expm1", "erf", "atan2", "cbrt"}
MOVE = {"broadcast_in_dim", "squeeze", "reshape", "concatenate", "slice",
        "pad", "rev", "transpose", "copy", "iota"}


def census(fn, *args, label=""):
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    counts = {"cheap": 0, "transc": 0, "move": 0, "other": 0, "dot": 0}
    per_prim = {}

    def _inner_jaxprs(params):
        import jax.extend as jex

        found = []
        for v in params.values():
            vs = v if isinstance(v, (tuple, list)) else [v]
            for u in vs:
                if isinstance(u, (jex.core.Jaxpr, jex.core.ClosedJaxpr)):
                    found.append(getattr(u, "jaxpr", u))
        return found

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            inner = _inner_jaxprs(eqn.params)
            if inner:
                # pjit/jit/custom_vjp/scan/cond/while wrappers: count the
                # body, not the wrapper (scan trip counts are not
                # multiplied in — none appear in the spline stage)
                for sub in inner:
                    walk(sub)
                continue
            elems = sum(int(np.prod(v.aval.shape)) for v in eqn.outvars
                        if hasattr(v.aval, "shape"))
            per_prim[name] = per_prim.get(name, 0) + elems
            if name in ("dot_general", "conv_general_dilated"):
                counts["dot"] += elems
            elif name in MOVE:
                counts["move"] += elems
            elif name in TRANSC:
                counts["transc"] += elems
            elif name in CHEAP:
                counts["cheap"] += elems
            else:
                counts["other"] += elems

    walk(jaxpr.jaxpr)
    print(f"\n== census: {label} ==")
    for k, v in sorted(per_prim.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v:12,d}")
    print("  " + "-" * 40)
    for k, v in counts.items():
        print(f"  {k.upper():28s} {v:12,d}")
    return counts


def run_census(R):
    import jax.numpy as jnp

    from nflows_tpu.ops.pallas import nsf_flow_kernel as nk

    K, T = 8, 3
    x = jnp.zeros((T, R), jnp.float32)
    P = jnp.zeros(((3 * K - 1) * T, R), jnp.float32)
    kw = dict(num_bins=K, T=T, tail_bound=3.0, min_bin_width=1e-3,
              min_bin_height=1e-3, min_derivative=1e-3)

    totals = {}
    for name, fn in [
        ("unpacked fwd", functools.partial(nk._rq_spline_TR, inverse=False,
                                           **kw)),
        ("unpacked inv", functools.partial(nk._rq_spline_TR, inverse=True,
                                           **kw)),
        ("packed-roll fwd", functools.partial(nk._rq_spline_TR_packed_roll,
                                              inverse=False, **kw)),
    ]:
        totals[name] = census(fn, x, P, label=f"{name}  [T={T}, R={R}]")
    return totals


def microbench():
    """Sustained VPU throughput for dependent chains at kernel shapes,
    and the REAL spline stage in isolation.

    Slope method at device scale: each pallas program runs an n-iteration
    dependent fori_loop; a grid of G programs repeats it G times
    sequentially on one core, so device time >> the ~20 ms tunnel
    dispatch and the (n_hi - n_lo) slope cancels every fixed cost."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from nflows_tpu.ops.pallas import nsf_flow_kernel as nk

    G = 32

    def timed(call, args, reps=4):
        # shared fetch-based protocol (benchmarks/_timing.py); the same
        # VMEM-resident input repeats — slope subtraction cancels any
        # re-dispatch anomaly along with every other fixed cost
        from benchmarks._timing import timeit_calls

        jf = jax.jit(call)
        return timeit_calls(jf, [args] * (reps + 1),
                            lambda o: float(jnp.asarray(o).ravel()[0]))

    def chain_time(shape, n, op):
        def kernel(x_ref, o_ref):
            x = x_ref[...]
            a = jnp.float32(1.0000001)
            b = jnp.float32(1e-7)

            def body(i, x):
                if op == "fma":
                    return x * a + b
                return jnp.exp(x * jnp.float32(-1e-6))

            o_ref[...] = jax.lax.fori_loop(0, n, body, x)

        f = pl.pallas_call(
            kernel, grid=(G,),
            in_specs=[pl.BlockSpec(shape, lambda i: (0, 0))],
            out_specs=pl.BlockSpec(shape, lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )
        return timed(f, (jnp.ones(shape, jnp.float32),))

    print("\n== VPU chain throughput (dependent ops, G=32 grid) ==")
    print(f"{'shape':>12s} {'op':>5s} {'ns/elem-op':>11s} {'Gelem-op/s':>11s}")
    rates = {}
    for shape in [(3, 1024), (8, 1024), (24, 1024), (8, 3072)]:
        for op in ("fma", "exp"):
            n_lo, n_hi = 2048, 16384
            dt = chain_time(shape, n_hi, op) - chain_time(shape, n_lo, op)
            elems = int(np.prod(shape)) * (n_hi - n_lo) * G
            ns = 1e9 * dt / elems
            rates[(shape, op)] = ns
            print(f"{str(shape):>12s} {op:>5s} {ns:11.4f} "
                  f"{1.0/max(ns,1e-9):11.2f}", flush=True)

    # --- the real spline stage, isolated, at megakernel shapes ---
    K, T, R = 8, 3, 1024
    kw = dict(num_bins=K, T=T, tail_bound=3.0, min_bin_width=1e-3,
              min_bin_height=1e-3, min_derivative=1e-3)

    def spline_time(fn, m, inverse=False):
        @nk._with_mosaic_moves
        def kernel(x_ref, p_ref, o_ref):
            P = p_ref[...]

            def body(i, x):
                out, lad = fn(x, P, inverse=inverse, **kw)
                # keep the chain dependent and in-domain
                return jnp.clip(out * jnp.float32(0.7), -3.0, 3.0)

            o_ref[...] = jax.lax.fori_loop(0, m, body, x_ref[...])

        f = pl.pallas_call(
            kernel, grid=(G,),
            in_specs=[pl.BlockSpec((T, R), lambda i: (0, 0)),
                      pl.BlockSpec(((3 * K - 1) * T, R), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((T, R), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
        )
        x = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, (T, R)),
                        jnp.float32)
        P = jnp.asarray(np.random.default_rng(1).normal(size=(
            (3 * K - 1) * T, R)) * 0.3, jnp.float32)
        return timed(f, (x, P))

    print("\n== real spline stage, isolated (per application of [T=3, R=1024]) ==")
    for name, fn in [("unpacked", nk._rq_spline_TR),
                     ("packed-roll", nk._rq_spline_TR_packed_roll)]:
        for inverse in (False, True):
            m_lo, m_hi = 4, 32
            dt = spline_time(fn, m_hi, inverse) - spline_time(fn, m_lo,
                                                              inverse)
            per_app_us = 1e6 * dt / ((m_hi - m_lo) * G)
            per_elem_ns = 1e3 * per_app_us / (T * R)
            d = "inv" if inverse else "fwd"
            print(f"  {name:12s} {d}: {per_app_us:8.2f} us/application "
                  f"= {per_elem_ns:6.2f} ns/element", flush=True)
    print("\ncompare: megakernel end-to-end = 57-66 ms / (262144 samples x"
          " 10 layers) = 22-25 ns per element-layer; GEMMs ~6 ms of that."
          " The spline-stage line above is the VPU floor share of it.")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--count", action="store_true",
                   help="jaxpr census only (any backend)")
    p.add_argument("--lanes", type=int, default=512)
    args = p.parse_args()

    totals = run_census(args.lanes)

    if not args.count:
        microbench()

    # scaling note for the floor arithmetic (done by hand in DESIGN.md):
    # the flagship pass = 10 layers x 262144 samples; each layer's spline
    # stage runs on [T=3, R=lane-tile] per grid step, so element-ops per
    # pass = census_total / R_census * 262144 * 10 / T? -- no: census is
    # already per [T, R] tile with R lanes covering R samples, so
    # per-pass = census_total * (262144 / R) * 10.
    n = 262144
    L = 10
    for name, c in totals.items():
        per_pass_cheap = c["cheap"] * (n / args.lanes) * L
        per_pass_tr = c["transc"] * (n / args.lanes) * L
        print(f"\n{name}: per-262k-pass element-ops: "
              f"cheap {per_pass_cheap/1e9:.2f}G, transc {per_pass_tr/1e9:.2f}G")


if __name__ == "__main__":
    main()
