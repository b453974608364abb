"""Neural density estimators (reference: nflows/nn/nde/__init__.py).

The implementation lives in ``made.py``, mirroring the reference's module
layout so ``from nflows_tpu.nn.nde.made import MixtureOfGaussiansMADE``
works exactly like the reference import path.
"""

from nflows_tpu.nn.nde.made import MixtureOfGaussiansMADE

__all__ = ["MixtureOfGaussiansMADE"]
