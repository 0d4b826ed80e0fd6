#!/usr/bin/env bash
# Multi-host training: launch one process per host with jax.distributed
# coordination (replaces the reference's mp.spawn + NCCL env:// rendezvous).
#   COORDINATOR=<host:port> NUM_PROCESSES=<n> PROCESS_ID=<i> ./dist_train.sh <data_dir> <dataset>
export JAX_COORDINATOR_ADDRESS="${COORDINATOR:-127.0.0.1:29500}"
export JAX_NUM_PROCESSES="${NUM_PROCESSES:-1}"
export JAX_PROCESS_ID="${PROCESS_ID:-0}"
python base.py --config configs/baseline.yaml --data_dir "${1:-./data}" --dataset "${2:-vidvrd}" --train
