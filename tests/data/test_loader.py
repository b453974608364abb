"""Native + numpy data loader tests."""

import numpy as np
import pytest

from nflows_tpu.data import (
    NativeDataLoader,
    NumpyDataLoader,
    make_dataloader,
    native_available,
)

N, D, C, B = 1000, 6, 2, 128


def _data():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(N, D)).astype(np.float32)
    ctx = rng.normal(size=(N, C)).astype(np.float32)
    return data, ctx


def test_native_toolchain_builds():
    assert native_available(), "g++ toolchain should be present in this image"


def test_native_loader_batches():
    data, _ = _data()
    loader = NativeDataLoader(data, batch_size=B, seed=7, num_workers=2)
    rows = set()
    for _ in range(20):
        batch = next(loader)
        assert batch.shape == (B, D)
        assert batch.dtype == np.float32
        # every emitted row must be an actual dataset row
        for r in batch[:4]:
            matches = np.where((data == r).all(axis=1))[0]
            assert len(matches) >= 1
            rows.add(int(matches[0]))
    assert len(rows) > 40  # shuffling across epochs reaches many rows
    loader.close()


def test_native_loader_epoch_coverage():
    """With drop_last, one epoch covers floor(N/B) unique batches with no
    repeated rows inside the epoch."""
    data = np.arange(512, dtype=np.float32).reshape(512, 1)
    loader = NativeDataLoader(data, batch_size=64, seed=1, num_workers=1)
    seen = []
    for _ in range(8):  # exactly one epoch
        seen.extend(next(loader)[:, 0].astype(int).tolist())
    assert sorted(seen) == list(range(512))
    loader.close()


def test_native_loader_with_context():
    data, ctx = _data()
    loader = NativeDataLoader(data, batch_size=B, context=ctx, seed=3)
    batch, cbatch = next(loader)
    assert batch.shape == (B, D) and cbatch.shape == (B, C)
    # row alignment: context row must correspond to the same source index
    i = np.where((data == batch[0]).all(axis=1))[0][0]
    np.testing.assert_array_equal(cbatch[0], ctx[i])
    loader.close()


def test_numpy_fallback_equivalence():
    data, _ = _data()
    loader = NumpyDataLoader(data, batch_size=B, seed=0)
    batch = next(loader)
    assert batch.shape == (B, D)


def test_make_dataloader_prefers_native():
    data, _ = _data()
    loader = make_dataloader(data, batch_size=B)
    assert isinstance(loader, NativeDataLoader)
    loader.close()


def test_native_deterministic_given_seed():
    data, _ = _data()
    l1 = NativeDataLoader(data, batch_size=B, seed=42, num_workers=1)
    l2 = NativeDataLoader(data, batch_size=B, seed=42, num_workers=1)
    for _ in range(3):
        np.testing.assert_array_equal(next(l1), next(l2))
    l1.close(); l2.close()


def test_drop_last_larger_batch_raises():
    """Regression: batch_size > n with drop_last hung the native loader
    (and short-batched the numpy one) instead of erroring."""
    import numpy as np
    import pytest

    from nflows_tpu.data import NumpyDataLoader, make_dataloader

    data = np.zeros((10, 2), dtype=np.float32)
    with pytest.raises(ValueError, match="never yield"):
        make_dataloader(data, 128)
    with pytest.raises(ValueError, match="never yield"):
        NumpyDataLoader(data, 128)
