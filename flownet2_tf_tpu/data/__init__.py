from flownet2_tf_tpu.data.dataset_configs import (  # noqa: F401
    FLYING_CHAIRS_DATASET_CONFIG,
    FLYING_THINGS_3D_DATASET_CONFIG,
    SINTEL_DATASET_CONFIG,
    KITTI_DATASET_CONFIG,
    get_dataset_config,
)
