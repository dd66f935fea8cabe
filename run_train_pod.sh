#!/bin/sh
# Multi-host TPU pod launcher (replaces the reference's SLURM script,
# run_train_slurm.sh): run this same command on every host of the pod;
# jax.distributed.initialize() picks up the TPU pod metadata.
CFG=${1:-configs/ade20k_convnext.yaml}
python -m tools.train --cfg "$CFG" --multihost
