"""flownet2_tf_tpu — a TPU-native JAX/XLA/Pallas re-implementation of the
FlowNet 2.0 optical-flow framework (reference: fperezgamonal/flownet2-tf,
a TF1/CUDA codebase; see SURVEY.md).

This is not a port: the three legacy CUDA ops (correlation cost volume,
bilinear flow-warp, area downsample) are implemented as Pallas TPU kernels
with pure-jnp oracles; the model zoo (FlowNetS/C/CS/CSS/SD/FlowNet2) is a set
of pure-function pytree modules jitted end-to-end under XLA; training is a
pjit data-parallel step over a jax.sharding.Mesh with optax + orbax.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: importing the package must not pull in jax/model code for
    # host-only users (e.g. flowlib IO in data tooling).
    if name in ("get_model", "MODEL_NAMES"):
        from flownet2_tf_tpu.models import registry

        return getattr(registry, name)
    raise AttributeError(name)
