from flownet2_tf_tpu.models.registry import get_model, MODEL_NAMES  # noqa: F401
