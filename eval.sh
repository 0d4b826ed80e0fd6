#!/usr/bin/env bash
python evaluate.py --data_dir "${1:-./data}" --dataset "${2:-vidvrd}" --split "${3:-test}" --task relation \
  --prediction "${4:-./vidvrd-baseline-output/models/baseline_relation_prediction.json}"
