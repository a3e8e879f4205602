#!/usr/bin/env python
"""Convenience wrapper matching the reference's root-script layout; the
implementation lives in tinyvc_tpu/cli/infer_webui.py."""
from tinyvc_tpu.cli.infer_webui import main

if __name__ == "__main__":
    main()
