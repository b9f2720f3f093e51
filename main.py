#!/usr/bin/env python3
"""Entry point: python main.py --url URL | --batch FILE [options]."""

import sys

from video_transformer_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
