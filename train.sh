#!/usr/bin/env bash
# Train the relation model (all local TPU devices, data-parallel mesh).
python base.py --config configs/baseline.yaml --data_dir "${1:-./data}" --dataset "${2:-vidvrd}" --train
