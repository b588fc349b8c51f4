"""Multi-host pod launcher (torchelastic/SLURM-requeue parity, SURVEY.md §2.8).

On TPU pods every host runs the same program; this wrapper initializes
jax.distributed from the environment and execs the CLI:

  # GKE/GCE TPU VM (coordinator auto-discovered from TPU metadata):
  python -m neurosis_tpu.tools.launch_pod fit -c configs/sdxl/sdxl.example.yaml

  # SLURM (srun sets SLURM_* vars):
  srun python -m neurosis_tpu.tools.launch_pod fit -c config.yaml

Environment handled:
  - TPU VMs: jax.distributed.initialize() with no args (libtpu discovers peers)
  - SLURM: coordinator = first node, process_id = SLURM_PROCID
  - manual: NEUROSIS_COORDINATOR, NEUROSIS_NUM_PROCESSES, NEUROSIS_PROCESS_ID
SIGTERM triggers a crash-dump checkpoint before exit (SLURM requeue parity,
trainer/cli.py:123-125).
"""

from __future__ import annotations

import logging
import os
import signal
import sys

logger = logging.getLogger(__name__)


def init_distributed_from_env() -> None:
    import jax

    if os.environ.get("NEUROSIS_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["NEUROSIS_COORDINATOR"],
            num_processes=int(os.environ["NEUROSIS_NUM_PROCESSES"]),
            process_id=int(os.environ["NEUROSIS_PROCESS_ID"]),
        )
        return
    if os.environ.get("SLURM_JOB_ID"):
        nodelist = os.environ.get("SLURM_STEP_NODELIST", os.environ.get("SLURM_JOB_NODELIST", ""))
        first = nodelist.split(",")[0].split("[")[0]
        jax.distributed.initialize(
            coordinator_address=f"{first}:8476",
            num_processes=int(os.environ.get("SLURM_NTASKS", 1)),
            process_id=int(os.environ.get("SLURM_PROCID", 0)),
        )
        return
    try:
        # TPU VM pods: libtpu + GCE metadata discover the topology
        jax.distributed.initialize()
    except Exception as e:  # single host
        logger.info(f"single-process run ({e})")


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    init_distributed_from_env()

    # SLURM requeue: convert SIGTERM into KeyboardInterrupt so the trainer's
    # crash-dump path runs before the scheduler kills us
    if os.environ.get("NEUROSIS_SLURM_SIGTERM"):
        signal.signal(signal.SIGTERM, lambda *_: (_ for _ in ()).throw(KeyboardInterrupt()))

    from neurosis_tpu.trainer.cli import main as cli_main

    return cli_main(argv)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
