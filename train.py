#!/usr/bin/env python
"""Training CLI: create-config / train / continue / tournament.

Root-level entry point mirroring /root/reference/train.py (subcommands at
train.py:44-92). All logic lives in ``alphazero_reversi_tpu.cli``.
"""
from alphazero_reversi_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
