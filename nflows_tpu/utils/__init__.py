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
from nflows_tpu.utils.validation import checkify_wrap, domain_checked_forward
from nflows_tpu.utils.typechecks import (
    is_bool,
    is_int,
    is_nonnegative_int,
    is_positive_int,
    is_power_of_two,
)


def get_num_parameters(module) -> int:
    """Total trainable parameter count of a Module / params pytree
    (reference: nflows/utils/torchutils.py:139-146; the reference exposes
    this at ``nflows.utils`` via the star-import of torchutils)."""
    import jax

    from nflows_tpu.core.module import partition

    params, _ = partition(module)
    return sum(
        x.size for x in jax.tree_util.tree_leaves(params) if x is not None
    )
