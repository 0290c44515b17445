#!/usr/bin/env bash
# Multi-host TPU pod launch (the cluster-submission counterpart of the
# reference's SGE scripts, scripts/job.sh / init-job.sh — which ran a single
# CUDA process; here each TPU host runs one process and jax.distributed wires
# them up over the pod).
#
# Run THIS SCRIPT on every host of the pod slice, e.g. via
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command="bash run_tpu_pod.sh"
#
# Env (set per deployment):
#   COORDINATOR   coordinator address host:port (default: first worker:8476)
#   NUM_PROCESSES number of hosts in the slice
#   PROCESS_ID    this host's index
set -euo pipefail

: "${COORDINATOR:?set COORDINATOR=host:port}"
: "${NUM_PROCESSES:?set NUM_PROCESSES}"
: "${PROCESS_ID:?set PROCESS_ID}"

exec python - "$@" <<'PY'
import sys
from desire_tpu.parallel.mesh import init_multihost
import os

init_multihost(os.environ["COORDINATOR"],
               int(os.environ["NUM_PROCESSES"]),
               int(os.environ["PROCESS_ID"]))

# after distributed init, jax.devices() spans the whole pod; the trainer's
# (data, k) mesh and shardings work unchanged (desire_tpu/parallel/mesh.py)
sys.argv = ["train.py"] + sys.argv[1:]
import train
train.main(sys.argv[1:])
PY
