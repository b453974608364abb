"""In-jit domain-error detection via ``jax.experimental.checkify``.

The reference raises ``InputOutsideDomain`` eagerly (e.g. Logit inputs
outside [0, 1], nflows/transforms/nonlinearities.py:184-187). Under jit no
Python exception can fire from traced code, so this framework's policy is
(DESIGN.md §2): clamp/propagate NaN in the hot path, and offer *checkified*
wrappers that surface the same violations as real Python errors with
location info — pay the checking cost only when you ask for it.

    checked_lp = checkify_wrap(lambda f, x: f.log_prob(x))
    checked_lp(flow, x)            # raises JaxRuntimeError on NaN/Inf

    fn = domain_checked_forward(logit_transform, low=0., high=1.)
    fn(x)                          # raises if any input outside [0, 1]

Complements ``enable_nan_debugging`` (observability.py), which is global
and debug-only; these wrappers are local and composable with jit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.experimental import checkify

__all__ = ["checkify_wrap", "domain_checked_forward"]


def checkify_wrap(fn: Callable, errors=None, jit: bool = True) -> Callable:
    """Wrap ``fn`` so NaN/Inf produced anywhere inside it (and any
    ``checkify.check`` it contains) raise ``jax.errors.JaxRuntimeError``
    on the host, even under jit."""
    if errors is None:
        errors = checkify.float_checks | checkify.user_checks
    checked = checkify.checkify(fn, errors=errors)
    if jit:
        checked = jax.jit(checked)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def domain_checked_forward(transform, low: Optional[float] = None,
                           high: Optional[float] = None,
                           direction: str = "forward") -> Callable:
    """``fn(x, context=None) -> (y, logabsdet)`` that raises (under jit) if
    any input lies outside [low, high] — the checkified analogue of the
    reference's ``InputOutsideDomain`` (nflows/transforms/base.py:16-19),
    e.g. ``domain_checked_forward(Logit(), 0., 1.)``."""
    if direction not in ("forward", "inverse"):
        raise ValueError(f"direction must be forward|inverse, got {direction!r}")
    apply = transform.inverse if direction == "inverse" else transform.forward

    def fn(x, context=None):
        if low is not None:
            checkify.check(jax.numpy.all(x >= low),
                           "input outside domain: min {m} below lower bound",
                           m=x.min())
        if high is not None:
            checkify.check(jax.numpy.all(x <= high),
                           "input outside domain: max {m} above upper bound",
                           m=x.max())
        return apply(x, context)

    return checkify_wrap(fn)
