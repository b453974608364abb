"""Reference import-path alias (nflows/utils/torchutils.py): every helper
the reference keeps there is re-exported here from its native home
(utils/{shapes,masks,linalg}.py + get_num_parameters)."""

from nflows_tpu.utils import get_num_parameters  # noqa: F401
from nflows_tpu.utils.linalg import (  # noqa: F401
    cbrt,
    gaussian_kde_log_eval,
    logabsdet,
    random_orthogonal,
    searchsorted,
)
from nflows_tpu.utils.masks import (  # noqa: F401
    create_alternating_binary_mask,
    create_mid_split_binary_mask,
    create_random_binary_mask,
)
from nflows_tpu.utils.shapes import (  # noqa: F401
    get_temperature,
    merge_leading_dims,
    repeat_rows,
    split_leading_dim,
    sum_except_batch,
    tensor_to_np,
    tile,
)
