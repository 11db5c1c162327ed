#!/usr/bin/env python
"""Drop-in wrapper matching the reference entry point name (train_stage1_twophase.py);
delegates to the unified stage-1 CLI."""
from lns_tpu.cli.train_stage1 import main

if __name__ == "__main__":
    main()
