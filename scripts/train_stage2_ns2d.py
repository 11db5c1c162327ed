#!/usr/bin/env python
"""Drop-in wrapper matching the reference entry point name (train_stage2_ns2d.py);
delegates to the unified stage-2 CLI."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lns_tpu.cli.train_stage2 import main

if __name__ == "__main__":
    main()
