"""Training schedules (parity: reference ``src/training_schedules.py``).

``LONG_SCHEDULE`` is the FlowNet2 paper's *S_long*, ``FINE_SCHEDULE`` is
*S_fine*. The dict layout mirrors the reference so that configs stay
auditable; :func:`make_lr_schedule` converts a schedule dict into an optax
piecewise-constant schedule (the TF1 code used
``tf.train.piecewise_constant`` — reference ``src/net.py`` train()).
"""

from __future__ import annotations

import optax

# weight_decay: the FlowNet2 paper trains with lambda = 0.0004 (Ilg et
# al. 2017, sec. "Training"); SURVEY.md §2.1 could not pin whether the
# TF1 port used 1e-4 or 4e-4 (reference mount unavailable). The paper
# value is used here — UNVERIFIED against the reference source; re-check
# src/training_schedules.py when the mount is populated.
_WEIGHT_DECAY = 0.0004

LONG_SCHEDULE = {
    "name": "long",
    "step_values": [400000, 600000, 800000, 1000000],
    "learning_rates": [0.0001, 0.00005, 0.000025, 0.0000125, 0.00000625],
    "momentum": 0.9,
    "momentum2": 0.999,
    "weight_decay": _WEIGHT_DECAY,
    "max_iter": 1200000,
}

# S_fine in the reference is expressed in GLOBAL steps continuing from
# the warm-start checkpoint (slim restores global_step, so the fine run
# spans 1.2M -> 1.7M with LR halvings at 1.4M/1.5M/1.6M). This framework
# warm-starts params only and counts every run from step 0, so the
# boundaries here are the RELATIVE translation: same 500k-step run, same
# LR trajectory (1e-5 halved at +200k/+300k/+400k). The earlier dict
# kept quasi-absolute boundaries (500k..800k) against a 500k max_iter,
# which left every decay unreachable — a constant-LR fine run.
# UNVERIFIED against the reference source (mount empty); re-check
# src/training_schedules.py when it appears.
FINE_SCHEDULE = {
    "name": "fine",
    "step_values": [200000, 300000, 400000],
    "learning_rates": [0.00001, 0.000005, 0.0000025, 0.00000125],
    "momentum": 0.9,
    "momentum2": 0.999,
    "weight_decay": _WEIGHT_DECAY,
    "max_iter": 500000,
}

# Tiny schedule for smoke tests / debugging (reference had an analogous
# short schedule for sanity runs).
SHORT_SCHEDULE = {
    "name": "short",
    "step_values": [300, 400],
    "learning_rates": [0.0001, 0.00005, 0.000025],
    "momentum": 0.9,
    "momentum2": 0.999,
    "weight_decay": _WEIGHT_DECAY,
    "max_iter": 500,
}

SCHEDULES = {
    "long": LONG_SCHEDULE,
    "fine": FINE_SCHEDULE,
    "short": SHORT_SCHEDULE,
}


def get_schedule(name):
    try:
        return SCHEDULES[name]
    except KeyError:
        raise KeyError(
            f"unknown schedule {name!r}; available: {sorted(SCHEDULES)}"
        ) from None


def make_lr_schedule(schedule):
    """Schedule dict -> optax schedule fn (piecewise constant).

    Semantics match ``tf.train.piecewise_constant(global_step, step_values,
    learning_rates)``: lr = learning_rates[i] while
    step_values[i-1] <= step < step_values[i].
    """
    if isinstance(schedule, str):
        schedule = get_schedule(schedule)
    boundaries = schedule["step_values"]
    rates = schedule["learning_rates"]
    if len(rates) != len(boundaries) + 1:
        raise ValueError("need len(learning_rates) == len(step_values) + 1")
    scales = {
        int(b): rates[i + 1] / rates[i] for i, b in enumerate(boundaries)
    }
    return optax.piecewise_constant_schedule(
        init_value=rates[0], boundaries_and_scales=scales
    )
