"""Reference import-path alias (the reference's canonical MADE lives at
nflows/transforms/made.py): ``from nflows_tpu.transforms.made import MADE``.
The implementation is nflows_tpu/nn/made.py."""

from nflows_tpu.nn.made import (  # noqa: F401
    MADE,
    MaskedDense,
    MaskedFeedforwardBlock,
    MaskedResidualBlock,
)

__all__ = ["MADE", "MaskedDense", "MaskedFeedforwardBlock", "MaskedResidualBlock"]
