"""A/B: space_to_depth lowering — 6-D reshape/transpose vs strided
slices + concat — measured END TO END on FlowNet2 448x1024 b1 bf16
(isolated microbenches mislead on this hardware; see docs/DESIGN.md).

The two lowerings produce byte-identical phase-major (qy, qx, c)
channel order; only the HLO XLA sees differs. The r3 profile attributes
~1.5 ms/pair to the input folds (two 0.50 ms reshapes + 0.23 ms copies
on [1,448,1024,3] -> [1,224,2,512,2,3]), so a better-lowered fold is
the cheapest candidate from the copy/glue bucket.

Run on the TPU:  python benchmarks/s2d_impl_ab.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import run_bench
from flownet2_tf_tpu.models import common


def s2d_slices(x):
    n, h, w, c = x.shape
    return jnp.concatenate(
        [
            x[:, 0::2, 0::2],
            x[:, 0::2, 1::2],
            x[:, 1::2, 0::2],
            x[:, 1::2, 1::2],
        ],
        axis=-1,
    )


def s2d_conv(x):
    return common._space_to_depth_conv(x)


def main():
    results = {}
    orig = common.space_to_depth

    for name, impl in (("transpose", orig), ("slices", s2d_slices),
                       ("conv", s2d_conv), ("transpose2", orig)):
        common.space_to_depth = impl
        r = run_bench(model="2", iters=16, repeats=3)
        results[name] = {
            "ms_per_pair": r["ms_per_pair"],
            "pairs_per_sec": r["value"],
        }
        print(name, json.dumps(results[name]), flush=True)
    common.space_to_depth = orig

    print(json.dumps(results))


if __name__ == "__main__":
    main()
