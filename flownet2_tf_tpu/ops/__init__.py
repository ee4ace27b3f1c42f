from flownet2_tf_tpu.ops.correlation import correlation  # noqa: F401
from flownet2_tf_tpu.ops.flow_warp import flow_warp  # noqa: F401
from flownet2_tf_tpu.ops.downsample import downsample  # noqa: F401
from flownet2_tf_tpu.ops.resize import resize_bilinear_tf1  # noqa: F401
from flownet2_tf_tpu.ops.dispatch import (  # noqa: F401
    get_implementation,
    set_implementation,
    use_implementation,
)
