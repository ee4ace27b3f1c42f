from flownet2_tf_tpu.training.loop import Trainer, TrainConfig  # noqa: F401
from flownet2_tf_tpu.training.infer import infer_flow, load_params  # noqa: F401
