"""Model registry: one place mapping CLI names to init/apply/loss triples.

The reference selected models by module path (``python -m
src.flownet_css.train``); here a single CLI takes ``--model`` and resolves
through this registry (SURVEY.md §5 config row).
"""

from __future__ import annotations

from flownet2_tf_tpu.models import flownet_c, flownet_s, flownet_sd, stacks
from flownet2_tf_tpu.models.base import Model

_REGISTRY = {
    "s": Model(
        name="FlowNetS",
        init=flownet_s.init,
        apply=flownet_s.apply,
        loss=flownet_s.loss,
    ),
    "c": Model(
        name="FlowNetC",
        init=flownet_c.init,
        apply=flownet_c.apply,
        loss=flownet_c.loss,
    ),
    "cs": Model(
        name="FlowNetCS",
        init=stacks.init_cs,
        apply=stacks.apply_cs,
        loss=stacks.loss_cs,
        default_frozen=("FlowNetC",),
    ),
    "css": Model(
        name="FlowNetCSS",
        init=stacks.init_css,
        apply=stacks.apply_css,
        loss=stacks.loss_css,
        default_frozen=("FlowNetCS",),
    ),
    "sd": Model(
        name="FlowNetSD",
        init=flownet_sd.init,
        apply=flownet_sd.apply,
        loss=flownet_sd.loss,
    ),
    "2": Model(
        name="FlowNet2",
        init=stacks.init_flownet2,
        apply=stacks.apply_flownet2,
        loss=stacks.loss_flownet2,
        default_frozen=("FlowNetCSS", "FlowNetSD"),
    ),
}

# aliases matching the reference package names
_ALIASES = {
    "flownet_s": "s",
    "flownet_c": "c",
    "flownet_cs": "cs",
    "flownet_css": "css",
    "flownet_sd": "sd",
    "flownet2": "2",
    "flownet-2": "2",
}

MODEL_NAMES = tuple(_REGISTRY)


def get_model(name: str) -> Model:
    key = name.lower()
    key = _ALIASES.get(key, key)
    try:
        return _REGISTRY[key]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
