from flownet2_tf_tpu.utils import flowlib  # noqa: F401
from flownet2_tf_tpu.utils.schedules import (  # noqa: F401
    LONG_SCHEDULE,
    FINE_SCHEDULE,
    SHORT_SCHEDULE,
)
