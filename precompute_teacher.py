#!/usr/bin/env python
"""Convenience wrapper (no reference counterpart — new tooling for cached
teacher distillation); the implementation lives in
tinyvc_tpu/cli/precompute_teacher.py."""
from tinyvc_tpu.cli.precompute_teacher import main

if __name__ == "__main__":
    main()
