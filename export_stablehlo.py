#!/usr/bin/env python
"""Convenience wrapper (the reference's export_onnx.py analogue; exports
StableHLO via jax.export)."""
from tinyvc_tpu.cli.export import main

if __name__ == "__main__":
    main()
