"""Subprocess worker for test_multiprocess.py — one jax.distributed
process of a 2-host CPU job (4 virtual devices per process).

Builds the same deterministic global batch on every host, keeps only this
process's shard, reassembles via parallel.mesh.put_global, and runs two
sharded train steps. Writes the step metrics as JSON so the parent test
can assert cross-process agreement and equality with a single-process run.
"""

import json
import sys


def main():
    pid, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"
    ckpt = sys.argv[6] if len(sys.argv) > 6 else ""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)

    import numpy as np

    from tests.mp_common import (
        cross_host_ckpt_roundtrip,
        multihost_evaluator_eval,
        run_two_steps,
    )

    if mode == "ckpt":
        metrics = cross_host_ckpt_roundtrip(ckpt)
    elif mode == "eval":
        metrics = multihost_evaluator_eval(ckpt)  # arg doubles as data root
    else:
        metrics = run_two_steps(shard=(pid, nproc))
    with open(out, "w") as f:
        json.dump(
            {
                "process_count": jax.process_count(),
                "n_devices": len(jax.devices()),
                **{k: float(np.asarray(v)) for k, v in metrics.items()},
            },
            f,
        )


if __name__ == "__main__":
    main()
