from nflows_tpu.utils.linalg import (
    cbrt,
    gaussian_kde_log_eval,
    logabsdet,
    random_orthogonal,
    searchsorted,
)
from nflows_tpu.utils.masks import (
    create_alternating_binary_mask,
    create_mid_split_binary_mask,
    create_random_binary_mask,
)
from nflows_tpu.utils.shapes import (
    get_temperature,
    merge_leading_dims,
    repeat_rows,
    split_leading_dim,
    sum_except_batch,
    tensor_to_np,
    tile,
)
from nflows_tpu.utils import typechecks
