"""Reference-compatible façade: ``Mode`` and ``Net``.

The reference exposed its runtime through ``src/net.py``'s ``Net`` base
class (``Net.train(log_dir, training_schedule, input_a, input_b, flow,
checkpoints=None)`` / ``Net.test(checkpoint, input_a_path, input_b_path,
out_path, save_image, save_flo)``, with a ``Mode`` enum). Users migrating
from the reference get the same surface here, mapped onto the TPU-native
runtime (Trainer / infer). New code should use those modules directly.
"""

from __future__ import annotations

import enum


class Mode(enum.Enum):
    TRAIN = 1
    TEST = 2


class Net:
    """Compatibility wrapper around the registry + Trainer + infer."""

    def __init__(self, model_name: str, mode: Mode = Mode.TRAIN,
                 debug: bool = False):
        from flownet2_tf_tpu.models.registry import get_model

        self.model_name = model_name
        self.model = get_model(model_name)
        self.mode = mode
        self.debug = debug
        if debug:
            # the reference's debug flag enabled extra graph assertions;
            # the jit-era equivalent is NaN trapping in compiled code
            import jax

            jax.config.update("jax_debug_nans", True)

    # -- inference ---------------------------------------------------------

    def test(self, checkpoint, input_a_path, input_b_path, out_path,
             save_image: bool = True, save_flo: bool = False):
        from flownet2_tf_tpu.training.infer import test_pair

        return test_pair(
            self.model_name, checkpoint, input_a_path, input_b_path,
            out_path, save_image=save_image, save_flo=save_flo,
        )

    # -- training ----------------------------------------------------------

    def train(self, log_dir, training_schedule, loader, preprocess=None,
              checkpoints=None, max_steps=None):
        """Train; ``loader`` is a BatchLoader (the queue-runner
        replacement for the reference's (input_a, input_b, flow) tensor
        triple); ``checkpoints`` follows the reference warm-start dict
        {path: (src_scope, dst_scope)}."""
        from flownet2_tf_tpu.training.loop import TrainConfig, Trainer

        cfg = TrainConfig(
            model=self.model_name,
            schedule=training_schedule,
            log_dir=log_dir,
            augment=preprocess is not None,
            max_steps=max_steps,
        )
        trainer = Trainer(cfg)
        return trainer.fit(
            loader, preprocess=preprocess,
            warm_start_checkpoints=checkpoints,
        )


# Concrete per-model classes, mirroring the reference's exported zoo
# (src/flownet_s/__init__.py etc. re-exports).

class FlowNetS(Net):
    def __init__(self, mode: Mode = Mode.TRAIN, debug: bool = False):
        super().__init__("s", mode, debug)


class FlowNetC(Net):
    def __init__(self, mode: Mode = Mode.TRAIN, debug: bool = False):
        super().__init__("c", mode, debug)


class FlowNetCS(Net):
    def __init__(self, mode: Mode = Mode.TRAIN, debug: bool = False):
        super().__init__("cs", mode, debug)


class FlowNetCSS(Net):
    def __init__(self, mode: Mode = Mode.TRAIN, debug: bool = False):
        super().__init__("css", mode, debug)


class FlowNetSD(Net):
    def __init__(self, mode: Mode = Mode.TRAIN, debug: bool = False):
        super().__init__("sd", mode, debug)


class FlowNet2(Net):
    def __init__(self, mode: Mode = Mode.TRAIN, debug: bool = False):
        super().__init__("2", mode, debug)
