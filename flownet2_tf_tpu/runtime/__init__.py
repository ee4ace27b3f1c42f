from flownet2_tf_tpu.runtime.native import (  # noqa: F401
    native_available,
    NativeIO,
    get_native_io,
)
