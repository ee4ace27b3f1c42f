"""``python -m flownet2_tf_tpu`` -> the unified CLI."""

import sys

from flownet2_tf_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
