#!/usr/bin/env python
"""Entry point: `python generate.py --model t2v-1.3B --prompt "..."`.

Equivalent of the reference's Wan_fps_inference_1gpu.py driver; see
`mmpl_tpu/cli.py` for all flags.
"""
import sys

from mmpl_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
