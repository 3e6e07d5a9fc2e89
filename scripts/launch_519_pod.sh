#!/usr/bin/env bash
# Multi-host pre-training launch recipe for the 519-label model — the
# TPU-pod equivalent of the reference's 4-GPU NCCL script
# (reference: ex_maest519.sh:1-23).
#
# On a TPU pod slice, run this same command on EVERY worker host (e.g. via
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`). JAX infers
# coordinator/process topology from the TPU environment; no NCCL-style
# env-var plumbing is needed (maest_tpu.parallel.mesh.init_distributed).
#
# Per-host batch 6 * hosts matches the reference's per-GPU batch 6 recipe;
# resume from the epoch-121 checkpoint like the reference invocation.
set -euo pipefail

RUN_DIR=${RUN_DIR:-runs/maest_30s_519}
CKPT=${CKPT:-}  # e.g. runs/maest_30s_519/checkpoints/epoch_121

python -m maest_tpu.apps.ex_maest main with \
    maest_30s_from_passt_pretrain \
    maest.n_classes=519 \
    datamodule.batch_size_train=6 \
    datamodule.groundtruth_train="${GROUNDTRUTH_TRAIN:?set GROUNDTRUTH_TRAIN}" \
    datamodule.groundtruth_val="${GROUNDTRUTH_VAL:?set GROUNDTRUTH_VAL}" \
    datamodule.base_dir="${MEL_BASE_DIR:?set MEL_BASE_DIR}" \
    trainer.default_root_dir="${RUN_DIR}" \
    ${CKPT:+ckpt_path="${CKPT}"}
