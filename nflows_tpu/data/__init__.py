from nflows_tpu.data.loader import (
    NativeDataLoader,
    NumpyDataLoader,
    make_dataloader,
    native_available,
)
