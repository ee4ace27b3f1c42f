"""Driver entry point: FlowNet2 frame pairs/sec/chip, one JSON line.

Thin delegator — the implementation lives in the installed package
(flownet2_tf_tpu/tools/bench.py) so the `flownet2-tpu bench` console
script works from any cwd / a pip install, not just a source checkout.
"""

from flownet2_tf_tpu.tools.bench import (  # noqa: F401
    REFERENCE_PAIRS_PER_SEC,
    main,
    run_bench,
)

if __name__ == "__main__":
    main()
