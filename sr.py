#!/usr/bin/env python
"""Situation recognition CLI — TPU-native framework entry point.

Flag-compatible with the reference ``sr.py`` (vFones/situation-recognition);
see ``situation_recognition_tpu/cli.py`` for the implementation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from situation_recognition_tpu.cli import main

if __name__ == "__main__":
    main()
