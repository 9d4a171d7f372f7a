#!/usr/bin/env python
"""Entry shim: `python train_vidreid_xent_htri.py ...` invokes the TPU
driver with the reference-compatible flag surface."""

from agrl_tpu.cli.train_vidreid_xent_htri import main

if __name__ == "__main__":
    main()
