from smoltts_tpu.models.dual_ar import (  # noqa: F401
    DualARParams,
    forward_train,
    init_params,
)
